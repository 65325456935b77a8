"""Driver-contract queries, wave 326 — Omori-style decay after the
largest burst day (hyperbolic rate fit over the aftermath window) and
the revenue-weighted median discount (exact weighted order statistic vs
the plain median). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES326: dict[str, str] = {}

_DAY_US = 86_400_000_000
_OM_WINDOW = 14


# ---------------------------------------------------------------------------
# events_omori_decay — hyperbolic aftermath of the biggest day
# ---------------------------------------------------------------------------


def q_events_omori_decay(sf_dir: str):
    """Omori-law fit after the peak: find the maximum-count day
    (earliest tie), then over the next 14 days with positive counts fit
    the linearized hyperbola 1/y = (c + t)/K by OLS of 1/y on t
    (t = days since peak, 1-based). Counts are exact; reciprocals and
    the OLS are mirrored float. One row: peak_day, peak_count,
    n_fit_days, k_milli, c_milli, r2_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["peak_day", "peak_count", "n_fit_days", "k_milli", "c_milli",
            "r2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    d0 = int(days.index.min())
    peak_idx = int(np.argmax(y))  # earliest max
    peak = int(y[peak_idx])
    after = y[peak_idx + 1: peak_idx + 1 + _OM_WINDOW]
    t = np.arange(1, len(after) + 1, dtype=np.int64)
    keep = after > 0
    t, after = t[keep], after[keep]
    m = len(t)
    if m < 3:
        return empty
    af = after.astype(np.float64)
    inv = 1.0 / af
    tf = t.astype(np.float64)
    sx, sy = float(tf.sum()), float(inv.sum())
    sxx = float((tf * tf).sum())
    # mirror the oracle's expression shapes: t / y and (1/y) / y
    sxy = float((tf / af).sum())
    syy = float((inv / af).sum())
    den = m * sxx - sx * sx
    if den == 0.0:
        return empty
    slope = (m * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / m
    if slope <= 0.0:
        return empty
    k = 1.0 / slope
    c = intercept * k
    den_y = m * syy - sy * sy
    r2 = (
        ((m * sxy - sx * sy) ** 2) / (den * den_y) if den_y > 0.0 else 0.0
    )
    return pd.DataFrame(
        [
            (
                np.int64(d0 + peak_idx), np.int64(peak), np.int64(m),
                np.int64(np.floor(k * 1_000.0 + 0.5)),
                np.int64(np.floor(c * 1_000.0 + 0.5)),
                np.int64(np.floor(r2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES326["events_omori_decay"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
pk AS (
  SELECT dy AS peak_day, y AS peak FROM x
  ORDER BY y DESC, dy LIMIT 1
),
aft AS (
  SELECT x.dy - pk.peak_day AS t, x.y
  FROM x, pk
  WHERE x.dy > pk.peak_day AND x.dy <= pk.peak_day + {_OM_WINDOW}
    AND x.y > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         sum(CAST(t AS DOUBLE)) AS sx, sum(1.0 / y) AS sy,
         sum(CAST(t AS DOUBLE) * t) AS sxx,
         sum(CAST(t AS DOUBLE) / y) AS sxy,
         sum(1.0 / y / y) AS syy
  FROM aft
),
fit AS (
  SELECT m, (m * sxy - sx * sy) / (m * sxx - sx * sx) AS slope,
         (sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m
           AS intercept,
         (m * sxy - sx * sy) * (m * sxy - sx * sy) AS num2,
         (m * sxx - sx * sx) AS dx, (m * syy - sy * sy) AS dy_
  FROM m WHERE m >= 3 AND (m * sxx - sx * sx) <> 0
)
SELECT pk.peak_day, pk.peak AS peak_count, fit.m AS n_fit_days,
       CAST(floor(1.0 / fit.slope * 1000.0 + 0.5) AS BIGINT) AS k_milli,
       CAST(floor(fit.intercept / fit.slope * 1000.0 + 0.5) AS BIGINT)
         AS c_milli,
       CAST(floor(CASE WHEN fit.dy_ > 0
                       THEN fit.num2 / (fit.dx * fit.dy_) ELSE 0.0 END
                  * 1000000.0 + 0.5) AS BIGINT) AS r2_micro
FROM pk, fit
WHERE fit.slope > 0"""


# ---------------------------------------------------------------------------
# lineitem_weighted_median — revenue-weighted median discount
# ---------------------------------------------------------------------------


def q_lineitem_weighted_median(sf_dir: str):
    """Revenue-weighted median discount: the smallest discount (milli)
    whose cumulative revenue weight reaches half the total — decided by
    the EXACT integer comparison 2 cum >= total — vs the plain
    (count-weighted) lower median; the gap shows whether big-ticket
    lines get deeper discounts. One row: n, wmed_milli, med_milli,
    diff_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        w = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"x": x, "n": 1, "w": w})
            .groupby("x", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_discount", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("x")[["n", "w"]]
        .sum()
        .sort_index()
    )
    cols = ["n", "wmed_milli", "med_milli", "diff_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    x = h.index.to_numpy(np.int64)
    n_v = h["n"].to_numpy(np.int64).astype(object)
    w_v = h["w"].to_numpy(np.int64).astype(object)
    n = int(n_v.sum())
    wt = int(w_v.sum())
    if n == 0 or wt == 0:
        return empty
    cum_w = np.cumsum(w_v)
    i_w = next(i for i, cw in enumerate(cum_w) if 2 * int(cw) >= wt)
    cum_n = np.cumsum(n_v)
    k = (n + 1) // 2
    i_n = next(i for i, cn in enumerate(cum_n) if int(cn) >= k)
    wmed, med = int(x[i_w]), int(x[i_n])
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(wmed), np.int64(med),
                np.int64(wmed - med),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES326["lineitem_weighted_median"] = """
WITH b AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS w
  FROM lineitem
),
h AS (
  SELECT x, CAST(count(*) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS w
  FROM b GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS wt
        FROM h),
cw AS (
  SELECT x, sum(w) OVER (ORDER BY x) AS cum_w,
         sum(n) OVER (ORDER BY x) AS cum_n
  FROM h
),
wmed AS (
  SELECT min(x) AS v FROM cw, tot WHERE 2 * cum_w >= tot.wt
),
med AS (
  SELECT min(x) AS v FROM cw, tot WHERE cum_n >= (tot.n + 1) // 2
)
SELECT tot.n, CAST(wmed.v AS BIGINT) AS wmed_milli,
       CAST(med.v AS BIGINT) AS med_milli,
       CAST(wmed.v - med.v AS BIGINT) AS diff_milli
FROM tot, wmed, med
WHERE tot.n > 0 AND tot.wt > 0"""


QUERIES326 = {
    "events_omori_decay": q_events_omori_decay,
    "lineitem_weighted_median": q_lineitem_weighted_median,
}
