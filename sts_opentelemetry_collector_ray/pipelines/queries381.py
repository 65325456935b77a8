"""Driver-contract queries, wave 381 — the Pettitt rank-based
change-point test on the zero-filled daily event series (exact integer
U-statistics via doubled ranks) and a key/name referential audit of
the customer dimension. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES381: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_pettitt_change_point — rank-based change point
# ---------------------------------------------------------------------------


def q_events_pettitt_change_point(sf_dir: str):
    """Pettitt test: with doubled average ranks R2 of the zero-filled
    daily counts, U(t) = sum_{i<=t} R2_i - t * (n + 1) is exactly the
    doubled sgn U-statistic (average-rank tie convention); the change
    point is the argmax of |U| over t = 1..n-1 (earliest tie) and the
    significance approximation p = 2 exp(-6 K^2 / (n^3 + n^2)) uses
    the HALVED K. One row: n_days, t_star, k_stat2, p_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(day).groupby(day).size()
        return pd.DataFrame(
            {"d": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    daily = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("d")["c"]
        .sum()
    )
    cols = ["n_days", "t_star", "k_stat2", "p_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    d0, d1 = int(daily.index.min()), int(daily.index.max())
    n = d1 - d0 + 1
    if n < 10:
        return empty
    x = np.zeros(n, np.int64)
    x[daily.index.to_numpy(np.int64) - d0] = daily.to_numpy(np.int64)
    vals, cnts = np.unique(x, return_counts=True)
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    r2v = 2 * below + cnts + 1
    r2 = r2v[np.searchsorted(vals, x)].astype(object)
    cum = np.cumsum(r2)
    best_u = -1
    t_star = -1
    for t_ in range(1, n):
        u = abs(int(cum[t_ - 1]) - t_ * (n + 1))
        if u > best_u:
            best_u = u
            t_star = t_
    k2 = best_u  # doubled K
    p = 2.0 * float(
        np.exp(
            -6.0 * (float(k2) / 2.0) * (float(k2) / 2.0)
            / (float(n) ** 3 + float(n) ** 2)
        )
    )
    if p > 1.0:
        p = 1.0
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(t_star), np.int64(k2),
                np.int64(np.floor(p * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES381["events_pettitt_change_point"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(d) AS d0, max(d) AS d1 FROM h),
grid AS (
  SELECT CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 100000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.d = (SELECT d0 FROM g) + grid.t
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
r AS (
  SELECT t,
         2 * (rank() OVER (ORDER BY y)) + (count(*) OVER (PARTITION BY y))
           - 1 AS r2
  FROM x
),
u AS (
  SELECT r.t + 1 AS tt,
         abs(sum(r.r2) OVER (ORDER BY r.t ROWS UNBOUNDED PRECEDING)
             - (r.t + 1) * (nn.n + 1)) AS au
  FROM r, nn
  WHERE r.t + 1 <= nn.n - 1
),
best AS (
  SELECT tt, au, row_number() OVER (ORDER BY au DESC, tt) AS rk
  FROM u
)
SELECT nn.n AS n_days, CAST(best.tt AS BIGINT) AS t_star,
       CAST(best.au AS BIGINT) AS k_stat2,
       CAST(floor(least(1.0,
              2.0 * exp(-6.0 * (CAST(best.au AS DOUBLE) / 2.0)
                        * (CAST(best.au AS DOUBLE) / 2.0)
                        / (CAST(nn.n AS DOUBLE) * nn.n * nn.n
                           + CAST(nn.n AS DOUBLE) * nn.n)))
              * 1000.0 + 0.5) AS BIGINT) AS p_milli
FROM best, nn
WHERE best.rk = 1 AND nn.n >= 10"""


# ---------------------------------------------------------------------------
# customer_key_name_audit — referential data-quality audit
# ---------------------------------------------------------------------------


def q_customer_key_name_audit(sf_dir: str):
    """Data-quality audit: does every c_name parse as
    'Customer#<digits>' and does the numeric suffix equal c_custkey?
    Also counts duplicate names and duplicate keys. Pure integers.
    One row: n, n_parse_ok, n_key_match, n_key_mismatch, n_dup_names,
    n_dup_keys."""

    def partial(t: pa.Table) -> pd.DataFrame:
        names = t["c_name"].to_numpy(zero_copy_only=False)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        parsed = np.full(len(names), -1, np.int64)
        ok = np.zeros(len(names), bool)
        for i, nm in enumerate(names):
            if isinstance(nm, str) and nm.startswith("Customer#"):
                suf = nm[len("Customer#"):]
                if suf.isdigit() and len(suf) > 0:
                    ok[i] = True
                    parsed[i] = int(suf)
        return pd.DataFrame(
            {
                "name": names,
                "k": keys,
                "ok": ok.astype(np.int64),
                "p": parsed,
            }
        )

    df = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_name", "c_custkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "n_parse_ok", "n_key_match", "n_key_mismatch",
            "n_dup_names", "n_dup_keys"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(df)
    if n == 0:
        return empty
    ok = df["ok"].to_numpy(np.int64) == 1
    match = ok & (df["p"].to_numpy(np.int64) == df["k"].to_numpy(np.int64))
    name_counts = df.groupby("name").size()
    key_counts = df.groupby("k").size()
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(int(ok.sum())),
                np.int64(int(match.sum())),
                np.int64(int((ok & ~match).sum())),
                np.int64(int(name_counts[name_counts >= 2].sum())),
                np.int64(int(key_counts[key_counts >= 2].sum())),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES381["customer_key_name_audit"] = """
WITH b AS (
  SELECT c_name AS name, c_custkey AS k,
         CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$')
              THEN 1 ELSE 0 END AS ok,
         CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$')
              THEN CAST(regexp_extract(c_name, '^Customer#([0-9]+)$', 1)
                        AS BIGINT)
              ELSE -1 END AS p
  FROM customer
),
dupn AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS v
  FROM (SELECT count(*) AS c FROM b GROUP BY name HAVING count(*) >= 2)
),
dupk AS (
  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS v
  FROM (SELECT count(*) AS c FROM b GROUP BY k HAVING count(*) >= 2)
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(ok) AS BIGINT) AS n_parse_ok,
       CAST(sum(CASE WHEN ok = 1 AND p = k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_key_match,
       CAST(sum(CASE WHEN ok = 1 AND p <> k THEN 1 ELSE 0 END)
            AS BIGINT) AS n_key_mismatch,
       dupn.v AS n_dup_names, dupk.v AS n_dup_keys
FROM b, dupn, dupk
GROUP BY dupn.v, dupk.v"""


QUERIES381 = {
    "events_pettitt_change_point": q_events_pettitt_change_point,
    "customer_key_name_audit": q_customer_key_name_audit,
}
