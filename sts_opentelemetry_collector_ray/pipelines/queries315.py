"""Driver-contract queries, wave 315 — Cramér's V effect size of the
type-mix drift between the first and second half of the observation
window, and the weekly-amplitude trend (is the within-week range
growing?). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES315: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_drift_cramers_v — drift effect size between halves
# ---------------------------------------------------------------------------


def q_events_drift_cramers_v(sf_dir: str):
    """Effect size of the temporal type-mix drift: split events at the
    midpoint timestamp (us midpoint of [min, max], second half
    inclusive), build the 2 x k type table, Pearson chi-square from
    EXACT integer counts, and Cramér's V = sqrt(chi2 / N) (2 rows ->
    min dimension 2). One row: n, n_first, n_second, chi2_micro,
    v_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        g = pd.DataFrame(
            {
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "n": 1,
            }
        )
        out = g.groupby("et", as_index=False).sum()
        out["mn"] = np.int64(us.min())
        out["mx"] = np.int64(us.max())
        return out.astype({"n": np.int64})

    # pass 1: global midpoint
    meta = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "mn": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().min()
                    )],
                    "mx": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().max()
                    )],
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["n", "n_first", "n_second", "chi2_micro", "v_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if meta.empty:
        return empty
    mid = (int(meta["mn"].min()) + int(meta["mx"].max())) // 2

    def half_counts(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        g = pd.DataFrame(
            {
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "h": (us >= mid).astype(np.int64),
            }
        )
        out = g.groupby(["et", "h"]).size().rename("c").reset_index()
        out["c"] = out["c"].astype(np.int64)
        return out

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(half_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "h"])["c"]
        .sum()
    )
    if m.empty:
        return empty
    types = sorted(set(m.index.get_level_values(0)))
    n1 = sum(int(m.get((t, 0), 0)) for t in types)
    n2 = sum(int(m.get((t, 1), 0)) for t in types)
    n = n1 + n2
    if n1 == 0 or n2 == 0:
        return empty
    chi2 = 0.0
    for t in types:
        ct = int(m.get((t, 0), 0)) + int(m.get((t, 1), 0))
        for h, nh in ((0, n1), (1, n2)):
            o = float(int(m.get((t, h), 0)))
            e = float(ct) * float(nh) / float(n)
            if e > 0.0:
                chi2 += (o - e) * (o - e) / e
    v = float(np.sqrt(chi2 / float(n)))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(n1), np.int64(n2),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(v * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES315["events_drift_cramers_v"] = """
WITH span AS (
  SELECT (CAST(min(epoch_us(ts)) AS BIGINT)
          + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS mid
  FROM events
),
m AS (
  SELECT event_type AS et,
         CAST(epoch_us(ts) >= span.mid AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events, span GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(CASE WHEN h = 0 THEN c ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN h = 1 THEN c ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(c) AS BIGINT) AS n
  FROM m
),
ct AS (SELECT et, CAST(sum(c) AS BIGINT) AS ctot FROM m GROUP BY 1),
cells AS (
  SELECT ct.et, hs.h,
         CAST(coalesce(m.c, 0) AS BIGINT) AS o,
         CAST(ct.ctot AS DOUBLE)
           * (CASE WHEN hs.h = 0 THEN tot.n1 ELSE tot.n2 END)
           / tot.n AS e
  FROM ct CROSS JOIN (SELECT 0 AS h UNION ALL SELECT 1) hs
  LEFT JOIN m ON m.et = ct.et AND m.h = hs.h, tot
),
chi AS (
  SELECT sum(CASE WHEN e > 0 THEN (o - e) * (o - e) / e ELSE 0 END)
           AS chi2
  FROM cells
)
SELECT tot.n, tot.n1 AS n_first, tot.n2 AS n_second,
       CAST(floor(chi.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro,
       CAST(floor(sqrt(chi.chi2 / tot.n) * 1000000.0 + 0.5) AS BIGINT)
         AS v_micro
FROM tot, chi
WHERE tot.n1 > 0 AND tot.n2 > 0"""


# ---------------------------------------------------------------------------
# events_seasonal_amplitude_trend — is the weekly range growing?
# ---------------------------------------------------------------------------


def q_events_seasonal_amplitude_trend(sf_dir: str):
    """Second-order seasonality: per complete calendar week the
    within-week RANGE (max - min of the 7 daily counts, exact
    integers); the OLS slope of range on week index asks whether the
    weekly amplitude grows or decays. One row: n_weeks,
    mean_range_milli, slope_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_weeks", "mean_range_milli", "slope_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    d0 = int(days.index.min())
    dy = d0 + np.arange(len(y), dtype=np.int64)
    df = pd.DataFrame({"wk": dy // 7, "y": y})
    sizes = df.groupby("wk")["wk"].transform("size")
    df = df[sizes == 7]
    if df["wk"].nunique() < 3:
        return empty
    g = df.groupby("wk")["y"].agg(["min", "max"])
    wk = g.index.to_numpy(np.int64)
    wk = wk - wk.min()  # 0-based week index
    r = (g["max"] - g["min"]).to_numpy(np.int64)
    b = len(wk)
    sx, sy = int(wk.sum()), int(r.sum())
    sxx = int((wk.astype(object) * wk.astype(object)).sum())
    sxy = int((wk.astype(object) * r.astype(object)).sum())
    den = b * sxx - sx * sx
    if den == 0:
        return empty
    slope = float(b * sxy - sx * sy) / float(den)
    mean_r = float(sy) / float(b)
    return pd.DataFrame(
        [
            (
                np.int64(b),
                np.int64(np.floor(mean_r * 1_000.0 + 0.5)),
                np.int64(np.floor(slope * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES315["events_seasonal_amplitude_trend"] = f"""
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
  SELECT grid.dy // 7 AS wk, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
full_wk AS (SELECT wk FROM x GROUP BY wk HAVING count(*) = 7),
sub AS (
  SELECT x.wk, CAST(max(x.y) - min(x.y) AS BIGINT) AS r
  FROM x JOIN full_wk USING (wk)
  GROUP BY 1
),
idx AS (
  SELECT wk - (SELECT min(wk) FROM sub) AS t, r FROM sub
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(t) AS BIGINT) AS sx,
         CAST(sum(r) AS BIGINT) AS sy,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx,
         CAST(sum(CAST(t AS HUGEINT) * r) AS HUGEINT) AS sxy
  FROM idx
)
SELECT b AS n_weeks,
       CAST(floor(CAST(sy AS DOUBLE) / b * 1000.0 + 0.5) AS BIGINT)
         AS mean_range_milli,
       CAST(floor(CAST(CAST(b AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(CAST(b AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
FROM m
WHERE b >= 3 AND (CAST(b AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) <> 0"""


QUERIES315 = {
    "events_drift_cramers_v": q_events_drift_cramers_v,
    "events_seasonal_amplitude_trend": q_events_seasonal_amplitude_trend,
}
