"""Driver-contract queries, wave 331 — the ARCH-LM volatility-clustering
test (lag-1 autocorrelation of SQUARED daily changes) and return-interval
scaling of threshold exceedances (mean recurrence time vs the 1/p law at
P50/P75/P90). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES331: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_arch_lm — volatility clustering of daily changes
# ---------------------------------------------------------------------------


def q_events_arch_lm(sf_dir: str):
    """Engle's ARCH-LM at lag 1 on daily changes: with z_t = d_t^2
    (EXACT integers), the lag-1 Pearson correlation r of (z_t, z_{t+1})
    and LM = m r^2 vs the chi-square(1) 5% critical value — significant
    LM means volatility clusters. One row: n_changes, r_micro, lm_micro,
    reject_5pct."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_changes", "r_micro", "lm_micro", "reject_5pct"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    if len(y) < 5:
        return empty
    d = (y[1:] - y[:-1]).astype(object)
    z = d * d
    x, w = z[:-1], z[1:]
    m = len(x)
    sx, sy = int(x.sum()), int(w.sum())
    sxx = int((x * x).sum())
    syy = int((w * w).sum())
    sxy = int((x * w).sum())
    cx = m * sxx - sx * sx
    cy = m * syy - sy * sy
    if cx <= 0 or cy <= 0:
        return empty
    r = float(m * sxy - sx * sy) / (
        float(np.sqrt(float(cx))) * float(np.sqrt(float(cy)))
    )
    lm = float(m) * r * r
    return pd.DataFrame(
        [
            (
                np.int64(m),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
                np.int64(np.floor(lm * 1_000_000.0 + 0.5)),
                np.int64(1 if lm > 3.841458820694124 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES331["events_arch_lm"] = f"""
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
d AS (
  SELECT t, y - lag(y) OVER (ORDER BY t) AS dv FROM x
),
z AS (
  SELECT t, CAST(dv AS HUGEINT) * dv AS z
  FROM d WHERE dv IS NOT NULL
),
p AS (
  SELECT a.z AS za, b.z AS zb
  FROM z a JOIN z b ON b.t = a.t + 1
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS m,
         CAST(sum(za) AS HUGEINT) AS sx, CAST(sum(zb) AS HUGEINT) AS sy,
         CAST(sum(za * za) AS HUGEINT) AS sxx,
         CAST(sum(zb * zb) AS HUGEINT) AS syy,
         CAST(sum(za * zb) AS HUGEINT) AS sxy
  FROM p
)
SELECT CAST(m AS BIGINT) AS n_changes,
       CAST(floor(CAST(m * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS r_micro,
       CAST(floor(CAST(m AS DOUBLE)
                  * (CAST(m * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))
                  * (CAST(m * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))
                  * 1000000.0 + 0.5) AS BIGINT) AS lm_micro,
       CAST(CASE WHEN CAST(m AS DOUBLE)
                      * (CAST(m * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))
                      * (CAST(m * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))
                      > 3.841458820694124
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM m
WHERE (m * sxx - sx * sx) > 0 AND (m * syy - sy * sy) > 0"""


# ---------------------------------------------------------------------------
# events_return_intervals — recurrence-time scaling of exceedances
# ---------------------------------------------------------------------------


def q_events_return_intervals(sf_dir: str):
    """Return-interval law: for thresholds at the P50/P75/P90 order
    statistics of the daily series (k = ceil(q n), exact), the mean gap
    between consecutive exceedance days should scale like
    n / n_exceed; the ratio tests clustering of extremes. Counting is
    exact; two divisions per threshold. Per q: q_pct, thr, n_exceed,
    mean_interval_milli, theory_milli, ratio_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = [
        "q_pct", "thr", "n_exceed", "mean_interval_milli", "theory_milli",
        "ratio_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 8:
        return empty
    ys = np.sort(y)
    rows = []
    for q in (50, 75, 90):
        k = (q * n + 99) // 100
        thr = int(ys[k - 1])
        idx = np.nonzero(y > thr)[0]
        ne = len(idx)
        if ne < 2:
            continue
        gaps = np.diff(idx)
        mean_int = float(int(gaps.sum())) / float(len(gaps))
        theory = float(n) / float(ne)
        rows.append(
            (
                np.int64(q), np.int64(thr), np.int64(ne),
                np.int64(np.floor(mean_int * 1_000.0 + 0.5)),
                np.int64(np.floor(theory * 1_000.0 + 0.5)),
                np.int64(np.floor(mean_int / theory * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES331["events_return_intervals"] = f"""
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
cum AS (SELECT y, sum(c) OVER (ORDER BY y) AS cc FROM vc),
qs AS (SELECT CAST(u.q AS BIGINT) AS q
       FROM (SELECT unnest([50, 75, 90]) AS q) u),
thr AS (
  SELECT qs.q, min(cum.y) AS t
  FROM qs, nn JOIN cum ON cum.cc * 100 >= qs.q * nn.n + 99
                          - ((qs.q * nn.n + 99) % 100)
  GROUP BY 1
),
exc AS (
  SELECT thr.q, thr.t AS thv, x.t AS day_t,
         lag(x.t) OVER (PARTITION BY thr.q ORDER BY x.t) AS prev
  FROM thr JOIN x ON x.y > thr.t
),
agg AS (
  SELECT q, max(thv) AS thv,
         CAST(count(*) AS BIGINT) AS ne,
         CAST(sum(day_t - prev) AS BIGINT) AS gap_sum,
         CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gaps
  FROM exc GROUP BY 1
)
SELECT agg.q AS q_pct, CAST(agg.thv AS BIGINT) AS thr, agg.ne AS n_exceed,
       CAST(floor(CAST(agg.gap_sum AS DOUBLE) / agg.n_gaps * 1000.0 + 0.5)
            AS BIGINT) AS mean_interval_milli,
       CAST(floor(CAST(nn.n AS DOUBLE) / agg.ne * 1000.0 + 0.5) AS BIGINT)
         AS theory_milli,
       CAST(floor((CAST(agg.gap_sum AS DOUBLE) / agg.n_gaps)
                  / (CAST(nn.n AS DOUBLE) / agg.ne) * 1000000.0 + 0.5)
            AS BIGINT) AS ratio_micro
FROM agg, nn
WHERE agg.ne >= 2 AND agg.n_gaps > 0 AND nn.n >= 8
ORDER BY agg.q"""


QUERIES331 = {
    "events_arch_lm": q_events_arch_lm,
    "events_return_intervals": q_events_return_intervals,
}
