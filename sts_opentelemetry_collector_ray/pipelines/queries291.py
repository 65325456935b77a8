"""Driver-contract queries, wave 291 — the Christoffersen independence
test on daily-count threshold exceedances (Markov vs Bernoulli LR, the
VaR-backtesting classic) and the Newcombe method-10 score interval for
the weekend-vs-weekday error-rate difference. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES291: dict[str, str] = {}

_DAY_US = 86_400_000_000
_Z95 = 1.959963984540054


# ---------------------------------------------------------------------------
# events_christoffersen — independence of threshold exceedances
# ---------------------------------------------------------------------------


def q_events_christoffersen(sf_dir: str):
    """Christoffersen (1998) independence test: exceedance indicator
    I_t = 1{y_t > P90} over the zero-filled daily series (the threshold
    is the exact k = ceil(0.9 n) order statistic), consecutive-day
    transition counts n00/n01/n10/n11, and
    LR = 2 (ll_markov - ll_bernoulli) with the 0 ln 0 = 0 convention —
    counting is pure integers, the logs are the float step. One row:
    n_days, t_thresh, n00, n01, n10, n11, lr_micro, reject_5pct —
    rejection means exceedances CLUSTER (volatility bursts)."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = [
        "n_days", "t_thresh", "n00", "n01", "n10", "n11", "lr_micro",
        "reject_5pct",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 3:
        return empty
    k = (9 * n + 9) // 10  # ceil(0.9 n)
    thr = int(np.sort(y)[k - 1])
    ind = (y > thr).astype(np.int64)
    a, b = ind[:-1], ind[1:]
    n00 = int(((a == 0) & (b == 0)).sum())
    n01 = int(((a == 0) & (b == 1)).sum())
    n10 = int(((a == 1) & (b == 0)).sum())
    n11 = int(((a == 1) & (b == 1)).sum())
    m = n00 + n01 + n10 + n11

    def xlnp(x: int, num: int, den: int) -> float:
        if x == 0 or num == 0 or den == 0:
            return 0.0
        return float(x) * float(np.log(float(num) / float(den)))

    pi_num, pi_den = n01 + n11, m
    ll0 = xlnp(n01 + n11, pi_num, pi_den) + xlnp(
        n00 + n10, pi_den - pi_num, pi_den
    )
    ll1 = (
        xlnp(n01, n01, n00 + n01)
        + xlnp(n00, n00, n00 + n01)
        + xlnp(n11, n11, n10 + n11)
        + xlnp(n10, n10, n10 + n11)
    )
    lr = 2.0 * (ll1 - ll0)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(thr), np.int64(n00), np.int64(n01),
                np.int64(n10), np.int64(n11),
                np.int64(np.floor(lr * 1_000_000.0 + 0.5)),
                np.int64(1 if lr > 3.841458820694124 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES291["events_christoffersen"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
thr AS (
  SELECT min(y) AS t FROM (
    SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM vc
  ), nn WHERE cum * 10 >= 9 * nn.n + 9 - ((9 * nn.n + 9) % 10)
),
ind AS (
  SELECT x.t AS tt, CAST(x.y > thr.t AS BIGINT) AS i FROM x, thr
),
tr AS (
  SELECT lag(i) OVER (ORDER BY tt) AS a, i AS b FROM ind
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM tr WHERE a IS NOT NULL
),
lr AS (
  SELECT n00, n01, n10, n11,
    2.0 * ((
      (CASE WHEN n01 > 0 THEN n01 * ln(CAST(n01 AS DOUBLE)
                                       / CAST(n00 + n01 AS DOUBLE))
            ELSE 0 END)
      + (CASE WHEN n00 > 0 THEN n00 * ln(CAST(n00 AS DOUBLE)
                                         / CAST(n00 + n01 AS DOUBLE))
              ELSE 0 END)
      + (CASE WHEN n11 > 0 THEN n11 * ln(CAST(n11 AS DOUBLE)
                                         / CAST(n10 + n11 AS DOUBLE))
              ELSE 0 END)
      + (CASE WHEN n10 > 0 THEN n10 * ln(CAST(n10 AS DOUBLE)
                                         / CAST(n10 + n11 AS DOUBLE))
              ELSE 0 END)
    ) - (
      (CASE WHEN n01 + n11 > 0
            THEN (n01 + n11) * ln(CAST(n01 + n11 AS DOUBLE)
                                  / CAST(n00 + n01 + n10 + n11 AS DOUBLE))
            ELSE 0 END)
      + (CASE WHEN n00 + n10 > 0
              THEN (n00 + n10) * ln(CAST(n00 + n10 AS DOUBLE)
                                    / CAST(n00 + n01 + n10 + n11 AS DOUBLE))
              ELSE 0 END)
    )) AS stat
  FROM cnt
)
SELECT nn.n AS n_days, thr.t AS t_thresh, lr.n00, lr.n01, lr.n10, lr.n11,
       CAST(floor(lr.stat * 1000000.0 + 0.5) AS BIGINT) AS lr_micro,
       CAST(CASE WHEN lr.stat > 3.841458820694124 THEN 1 ELSE 0 END
            AS BIGINT) AS reject_5pct
FROM nn, thr, lr
WHERE nn.n >= 3"""


# ---------------------------------------------------------------------------
# events_newcombe_diff — score CI for weekend-vs-weekday error rates
# ---------------------------------------------------------------------------


def q_events_newcombe_diff(sf_dir: str):
    """Newcombe method-10 confidence interval for the difference of
    'error'-type event shares between true weekends (epoch-day % 7 in
    {2, 3} — Sat/Sun) and weekdays: Wilson score bounds per group,
    d = p1 - p2, CI = [d - sqrt((p1-l1)^2 + (u2-p2)^2),
    d + sqrt((u1-p1)^2 + (p2-l2)^2)]. Counts are exact; the score
    algebra is mirrored float. One row: n_weekend, x_weekend, n_weekday,
    x_weekday, d_micro, lo_micro, hi_micro, sig_5pct."""

    def partial(t: pa.Table) -> pd.DataFrame:
        dy = (pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US) % 7
        wk = ((dy == 2) | (dy == 3)).astype(np.int64)
        err = (
            t["event_type"].to_numpy(zero_copy_only=False) == "error"
        ).astype(np.int64)
        df = pd.DataFrame({"wk": wk, "n": 1, "x": err})
        return df.groupby("wk", as_index=False).sum().astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("wk")[["n", "x"]]
        .sum()
    )
    cols = [
        "n_weekend", "x_weekend", "n_weekday", "x_weekday",
        "d_micro", "lo_micro", "hi_micro", "sig_5pct",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if 1 not in m.index or 0 not in m.index:
        return empty
    n1, x1 = int(m.loc[1, "n"]), int(m.loc[1, "x"])
    n2, x2 = int(m.loc[0, "n"]), int(m.loc[0, "x"])
    if n1 == 0 or n2 == 0:
        return empty
    z = _Z95

    def wilson(x: int, n: int):
        p = float(x) / float(n)
        denom = 1.0 + z * z / float(n)
        center = (p + z * z / (2.0 * float(n))) / denom
        half = (
            z
            * np.sqrt(
                p * (1.0 - p) / float(n)
                + z * z / (4.0 * float(n) * float(n))
            )
            / denom
        )
        return p, center - half, center + half

    p1, l1, u1 = wilson(x1, n1)
    p2, l2, u2 = wilson(x2, n2)
    d = p1 - p2
    lo = d - float(np.sqrt((p1 - l1) ** 2 + (u2 - p2) ** 2))
    hi = d + float(np.sqrt((u1 - p1) ** 2 + (p2 - l2) ** 2))
    sig = 1 if (lo > 0.0 or hi < 0.0) else 0
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        [
            (
                np.int64(n1), np.int64(x1), np.int64(n2), np.int64(x2),
                micro(d), micro(lo), micro(hi), np.int64(sig),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES291["events_newcombe_diff"] = f"""
WITH base AS (
  SELECT CAST(((epoch_us(ts) // {_DAY_US}) % 7) IN (2, 3) AS BIGINT) AS wk,
         CAST(event_type = 'error' AS BIGINT) AS err
  FROM events
),
m AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS n, CAST(sum(err) AS BIGINT) AS x
  FROM base GROUP BY 1
),
two AS (
  SELECT
    (SELECT n FROM m WHERE wk = 1) AS n1, (SELECT x FROM m WHERE wk = 1)
      AS x1,
    (SELECT n FROM m WHERE wk = 0) AS n2, (SELECT x FROM m WHERE wk = 0)
      AS x2
),
w AS (
  SELECT n1, x1, n2, x2,
         CAST(x1 AS DOUBLE) / n1 AS p1, CAST(x2 AS DOUBLE) / n2 AS p2,
         {_Z95} AS z
  FROM two WHERE n1 IS NOT NULL AND n2 IS NOT NULL AND n1 > 0 AND n2 > 0
),
b AS (
  SELECT *,
    (p1 + z * z / (2.0 * n1)) / (1.0 + z * z / n1)
      - z * sqrt(p1 * (1.0 - p1) / n1 + z * z / (4.0 * n1 * n1))
        / (1.0 + z * z / n1) AS l1,
    (p1 + z * z / (2.0 * n1)) / (1.0 + z * z / n1)
      + z * sqrt(p1 * (1.0 - p1) / n1 + z * z / (4.0 * n1 * n1))
        / (1.0 + z * z / n1) AS u1,
    (p2 + z * z / (2.0 * n2)) / (1.0 + z * z / n2)
      - z * sqrt(p2 * (1.0 - p2) / n2 + z * z / (4.0 * n2 * n2))
        / (1.0 + z * z / n2) AS l2,
    (p2 + z * z / (2.0 * n2)) / (1.0 + z * z / n2)
      + z * sqrt(p2 * (1.0 - p2) / n2 + z * z / (4.0 * n2 * n2))
        / (1.0 + z * z / n2) AS u2
  FROM w
),
ci AS (
  SELECT n1, x1, n2, x2, p1 - p2 AS d,
         p1 - p2 - sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2))
           AS lo,
         p1 - p2 + sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2))
           AS hi
  FROM b
)
SELECT n1 AS n_weekend, x1 AS x_weekend, n2 AS n_weekday, x2 AS x_weekday,
       CAST(floor(d * 1000000.0 + 0.5) AS BIGINT) AS d_micro,
       CAST(floor(lo * 1000000.0 + 0.5) AS BIGINT) AS lo_micro,
       CAST(floor(hi * 1000000.0 + 0.5) AS BIGINT) AS hi_micro,
       CAST(CASE WHEN lo > 0.0 OR hi < 0.0 THEN 1 ELSE 0 END AS BIGINT)
         AS sig_5pct
FROM ci"""


QUERIES291 = {
    "events_christoffersen": q_events_christoffersen,
    "events_newcombe_diff": q_events_newcombe_diff,
}
