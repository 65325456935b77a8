"""Driver-contract queries, wave 364 — exact RFM (recency/frequency/
monetary) tercile segmentation of customers and a count-min sketch
accuracy audit over user event counts (depth 4 x width 256, FNV-1a
cells, integer-exact overestimates). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES364: dict[str, str] = {}

_DAY_US = 86_400_000_000
_CMS_W = 256
_CMS_D = 4


# ---------------------------------------------------------------------------
# orders_rfm_segmentation — exact tercile-score census
# ---------------------------------------------------------------------------


def q_orders_rfm_segmentation(sf_dir: str):
    """Classic RFM: per customer recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (total cents); each scored 0..2 against EXACT tercile boundaries
    (sorted value at ceil(n/3), ceil(2n/3); score = #boundaries
    strictly exceeded). Census per (r, f, m) cell — pure integers, no
    floats anywhere. Per cell: r_score, f_score, m_score,
    n_customers."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        day = (
            df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
            // _DAY_US
        )
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "k": df["o_custkey"].to_numpy(np.int64),
                    "last": day,
                    "n": 1,
                    "s": cents,
                }
            )
            .groupby("k", as_index=False)
            .agg({"last": "max", "n": "sum", "s": "sum"})
        )
        return g.astype(np.int64)

    per = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")
        .agg({"last": "max", "n": "sum", "s": "sum"})
    )
    cols = ["r_score", "f_score", "m_score", "n_customers"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(per)
    if n < 3:
        return empty
    max_day = int(per["last"].max())
    rec = max_day - per["last"].to_numpy(np.int64)
    freq = per["n"].to_numpy(np.int64)
    mon = per["s"].to_numpy(np.int64)

    def score(v: np.ndarray) -> np.ndarray:
        s = np.sort(v)
        b1 = int(s[(n + 2) // 3 - 1])
        b2 = int(s[(2 * n + 2) // 3 - 1])
        return (v > b1).astype(np.int64) + (v > b2).astype(np.int64)

    cells = (
        pd.DataFrame(
            {"r_score": score(rec), "f_score": score(freq),
             "m_score": score(mon)}
        )
        .groupby(["r_score", "f_score", "m_score"])
        .size()
        .rename("n_customers")
        .reset_index()
        .sort_values(["r_score", "f_score", "m_score"])
        .reset_index(drop=True)
    )
    return cells.astype({c: np.int64 for c in cols})


ORACLES364["orders_rfm_segmentation"] = f"""
WITH per AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // {_DAY_US}) AS last,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              max(last) AS maxd FROM per),
vals AS (
  SELECT per.o_custkey, nn.maxd - per.last AS r, per.f, per.m
  FROM per, nn
),
rb AS (
  SELECT max(CASE WHEN rn = (n + 2) // 3 THEN v END) AS b1,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN v END) AS b2
  FROM (SELECT r AS v, row_number() OVER (ORDER BY r) AS rn FROM vals),
       nn
),
fb AS (
  SELECT max(CASE WHEN rn = (n + 2) // 3 THEN v END) AS b1,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN v END) AS b2
  FROM (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn FROM vals),
       nn
),
mb AS (
  SELECT max(CASE WHEN rn = (n + 2) // 3 THEN v END) AS b1,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN v END) AS b2
  FROM (SELECT m AS v, row_number() OVER (ORDER BY m) AS rn FROM vals),
       nn
),
scored AS (
  SELECT
    CAST(CASE WHEN vals.r > rb.b1 THEN 1 ELSE 0 END
         + CASE WHEN vals.r > rb.b2 THEN 1 ELSE 0 END AS BIGINT)
      AS r_score,
    CAST(CASE WHEN vals.f > fb.b1 THEN 1 ELSE 0 END
         + CASE WHEN vals.f > fb.b2 THEN 1 ELSE 0 END AS BIGINT)
      AS f_score,
    CAST(CASE WHEN vals.m > mb.b1 THEN 1 ELSE 0 END
         + CASE WHEN vals.m > mb.b2 THEN 1 ELSE 0 END AS BIGINT)
      AS m_score
  FROM vals, rb, fb, mb, nn
  WHERE nn.n >= 3
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score"""


# ---------------------------------------------------------------------------
# events_cms_accuracy — count-min sketch overestimate audit
# ---------------------------------------------------------------------------


def _fnv_cell(key: str) -> int:
    acc = 2166136261
    for ch in key:
        acc = ((acc ^ ord(ch)) * 16777619) % 4294967296
    return acc % _CMS_W


def q_events_cms_accuracy(sf_dir: str):
    """Count-min sketch audit: hash every user's event count into a
    depth-4 x width-256 CMS (FNV-1a over 'user#depth' decimal
    strings); for the top-10 users by true count the CMS estimate is
    the min over the 4 cells — integer-exact overestimates. Per user:
    user_id, true_n, est_n, over_n.

    Scale shape: per-user counts reduce first; the 4x256 sketch is a
    bounded fold any node can hold — the audit is a broadcast lookup."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        return pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "n": g.to_numpy(np.int64)}
        )

    per = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("u")["n"]
        .sum()
    )
    cols = ["user_id", "true_n", "est_n", "over_n"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if per.empty:
        return empty
    users = per.index.to_numpy(np.int64)
    counts = per.to_numpy(np.int64)
    cells = np.zeros((_CMS_D, _CMS_W), np.int64)
    hashes = np.zeros((_CMS_D, len(users)), np.int64)
    for i, u in enumerate(users):
        for d in range(_CMS_D):
            h = _fnv_cell(f"{int(u)}#{d}")
            hashes[d, i] = h
            cells[d, h] += int(counts[i])
    top = np.lexsort((users, -counts))[:10]
    rows = []
    for i in sorted(top, key=lambda j: (-int(counts[j]), int(users[j]))):
        est = min(int(cells[d, hashes[d, i]]) for d in range(_CMS_D))
        rows.append(
            (np.int64(int(users[i])), np.int64(int(counts[i])),
             np.int64(est), np.int64(est - int(counts[i])))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


def _cms_hash_sql(d: int) -> str:
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        "list_transform(string_split("
        f"CAST(u AS VARCHAR) || '#{d}', ''), "
        "c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % "
        f"{_CMS_W}"
    )


ORACLES364["events_cms_accuracy"] = f"""
WITH per AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
hashed AS (
  SELECT u, n,
         ({_cms_hash_sql(0)}) AS h0,
         ({_cms_hash_sql(1)}) AS h1,
         ({_cms_hash_sql(2)}) AS h2,
         ({_cms_hash_sql(3)}) AS h3
  FROM per
),
cells AS (
  SELECT d, h, CAST(sum(n) AS BIGINT) AS s
  FROM (
    SELECT 0 AS d, h0 AS h, n FROM hashed
    UNION ALL SELECT 1, h1, n FROM hashed
    UNION ALL SELECT 2, h2, n FROM hashed
    UNION ALL SELECT 3, h3, n FROM hashed
  )
  GROUP BY 1, 2
),
est AS (
  SELECT hashed.u, hashed.n,
         least(c0.s, c1.s, c2.s, c3.s) AS e
  FROM hashed
  JOIN cells c0 ON c0.d = 0 AND c0.h = hashed.h0
  JOIN cells c1 ON c1.d = 1 AND c1.h = hashed.h1
  JOIN cells c2 ON c2.d = 2 AND c2.h = hashed.h2
  JOIN cells c3 ON c3.d = 3 AND c3.h = hashed.h3
)
SELECT CAST(u AS BIGINT) AS user_id, n AS true_n,
       CAST(e AS BIGINT) AS est_n, CAST(e - n AS BIGINT) AS over_n
FROM est
ORDER BY true_n DESC, user_id
LIMIT 10"""


QUERIES364 = {
    "orders_rfm_segmentation": q_orders_rfm_segmentation,
    "events_cms_accuracy": q_events_cms_accuracy,
}
