"""Driver-contract queries, wave 352 — joint-burst tail dependence
between the top-2 event types' daily series (do their busy days
coincide beyond independence?) and the first-week activation curve
(early engagement vs later retention). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES352: dict[str, str] = {}

_DAY_US = 86_400_000_000
_AC_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_series_tail_dependence — joint P90 exceedance of type series
# ---------------------------------------------------------------------------


def q_events_series_tail_dependence(sf_dir: str):
    """Joint bursts: the top-2 types' zero-filled daily series, each
    thresholded at its own exact P90 order statistic
    (k = ceil(0.9 n)); lambda = n * |joint| / (|a tail| * |b tail|)
    (1 = independent, > 1 = bursts coincide). Pure integer counting.
    One row: type_a, type_b, n_days, na_tail, nb_tail, n_joint,
    lambda_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "dy": pa.compute.cast(t["ts"], pa.int64()).to_numpy()
                // _DAY_US,
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["dy", "et"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["dy", "et"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["type_a", "type_b", "n_days", "na_tail", "nb_tail", "n_joint",
            "lambda_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if h.empty:
        return empty
    totals = (
        h.groupby("et")["c"].sum().reset_index()
        .sort_values(["c", "et"], ascending=[False, True])
    )
    if len(totals) < 2:
        return empty
    ta, tb = totals["et"].tolist()[:2]
    d0, d1 = int(h["dy"].min()), int(h["dy"].max())
    n = d1 - d0 + 1
    if n < 10:
        return empty

    def series(name: str) -> np.ndarray:
        v = np.zeros(n, np.int64)
        sub = h[h["et"] == name]
        v[sub["dy"].to_numpy(np.int64) - d0] = sub["c"].to_numpy(np.int64)
        return v

    a, b = series(ta), series(tb)
    k = (9 * n + 9) // 10

    def thr(v: np.ndarray) -> int:
        return int(np.sort(v)[k - 1])

    tha, thb = thr(a), thr(b)
    ea, eb = a > tha, b > thb
    na, nb = int(ea.sum()), int(eb.sum())
    nj = int((ea & eb).sum())
    if na == 0 or nb == 0:
        return empty
    lam = float(n) * float(nj) / (float(na) * float(nb))
    return pd.DataFrame(
        [
            (
                ta, tb, np.int64(n), np.int64(na), np.int64(nb),
                np.int64(nj),
                np.int64(np.floor(lam * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES352["events_series_tail_dependence"] = f"""
WITH tc AS (
  SELECT event_type, row_number() OVER (ORDER BY count(*) DESC, event_type)
           AS rk
  FROM events GROUP BY 1
),
top2 AS (SELECT event_type, rk FROM tc WHERE rk <= 2),
h AS (
  SELECT epoch_us(e.ts) // {_DAY_US} AS dy, top2.rk,
         CAST(count(*) AS BIGINT) AS c
  FROM events e JOIN top2 ON top2.event_type = e.event_type
  GROUP BY 1, 2
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1
      FROM (SELECT epoch_us(ts) // {_DAY_US} AS dy FROM events)),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
sa AS (
  SELECT grid.dy, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.dy = grid.dy AND h.rk = 1
),
sb AS (
  SELECT grid.dy, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.dy = grid.dy AND h.rk = 2
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sa),
tha AS (
  SELECT y AS t FROM sa, nn ORDER BY y
  LIMIT 1 OFFSET (SELECT (9 * n + 9) // 10 - 1 FROM nn)
),
thb AS (
  SELECT y AS t FROM sb, nn ORDER BY y
  LIMIT 1 OFFSET (SELECT (9 * n + 9) // 10 - 1 FROM nn)
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN sa.y > tha.t THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN sb.y > thb.t THEN 1 ELSE 0 END) AS BIGINT) AS nb,
    CAST(sum(CASE WHEN sa.y > tha.t AND sb.y > thb.t THEN 1 ELSE 0 END)
         AS BIGINT) AS nj
  FROM sa JOIN sb USING (dy), tha, thb
)
SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
       nn.n AS n_days, cnt.na AS na_tail, cnt.nb AS nb_tail,
       cnt.nj AS n_joint,
       CAST(floor(CAST(nn.n AS DOUBLE) * cnt.nj
                  / (CAST(cnt.na AS DOUBLE) * cnt.nb) * 1000000.0 + 0.5)
            AS BIGINT) AS lambda_micro
FROM nn, cnt
WHERE nn.n >= 10 AND cnt.na > 0 AND cnt.nb > 0"""


# ---------------------------------------------------------------------------
# users_activation_curve — first-week engagement vs later retention
# ---------------------------------------------------------------------------


def q_users_activation_curve(sf_dir: str):
    """Activation: per user, events within 7 days of their FIRST event
    (activation, bucketed 1 / 2-4 / 5+) and whether they act again
    AFTER 30 days from the first event (retained). Pure integer
    counting. Per bucket: activation_bucket, n_users, n_retained,
    rate_micro.

    Scale shape: per-user (first day, first-week count, any-late flag)
    via ONE user-bucket exchange (two sub-reduces inside the bucket)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"u": u, "us": us})
        df["_b"] = (df["u"] % _AC_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {"b": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64),
             "r": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return zero
        first = g.groupby("u")["us"].min().rename("f")
        gg = g.merge(first.reset_index(), on="u")
        rel = gg["us"].to_numpy(np.int64) - gg["f"].to_numpy(np.int64)
        gg = gg.assign(
            wk1=(rel < 7 * _DAY_US).astype(np.int64),
            late=(rel >= 30 * _DAY_US).astype(np.int64),
        )
        per = gg.groupby("u").agg(wk1=("wk1", "sum"), late=("late", "max"))
        w = per["wk1"].to_numpy(np.int64)
        b = np.where(w <= 1, 0, np.where(w <= 4, 1, 2)).astype(np.int64)
        df = pd.DataFrame(
            {"b": b, "n": 1, "r": per["late"].to_numpy(np.int64)}
        )
        return df.groupby("b", as_index=False).sum().astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("b")[["n", "r"]]
        .sum()
        .sort_index()
    )
    cols = ["activation_bucket", "n_users", "n_retained", "rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    out = h.reset_index().rename(
        columns={"b": "activation_bucket", "n": "n_users",
                 "r": "n_retained"}
    )
    out["rate_micro"] = np.floor(
        out["n_retained"].to_numpy(np.float64)
        / out["n_users"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES352["users_activation_curve"] = f"""
WITH per AS (
  SELECT user_id, epoch_us(ts) AS us,
         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS f
  FROM events
),
agg AS (
  SELECT user_id,
         CAST(sum(CASE WHEN us - f < 7 * {_DAY_US} THEN 1 ELSE 0 END)
              AS BIGINT) AS wk1,
         CAST(max(CASE WHEN us - f >= 30 * {_DAY_US} THEN 1 ELSE 0 END)
              AS BIGINT) AS late
  FROM per GROUP BY 1
),
b AS (
  SELECT CASE WHEN wk1 <= 1 THEN 0 WHEN wk1 <= 4 THEN 1 ELSE 2 END AS b,
         late
  FROM agg
),
h AS (
  SELECT CAST(b AS BIGINT) AS activation_bucket,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(late) AS BIGINT) AS n_retained
  FROM b GROUP BY 1
)
SELECT activation_bucket, n_users, n_retained,
       CAST(floor(CAST(n_retained AS DOUBLE) / CAST(n_users AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
FROM h
ORDER BY activation_bucket"""


QUERIES352 = {
    "events_series_tail_dependence": q_events_series_tail_dependence,
    "users_activation_curve": q_users_activation_curve,
}
