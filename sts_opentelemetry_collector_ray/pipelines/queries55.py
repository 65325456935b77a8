"""Driver-contract queries, wave 55 — fixed-point EWMA smoothing of the
hourly series (the level estimate behind alerting baselines, as an EXACT
integer recurrence) and MAD-based robust anomaly counting (the
outlier-detection step that survives the heavy tails z-scores don't). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES55: dict[str, str] = {}

_EWMA_SCALE = 1_000_000  # fixed-point 1e-6
_EWMA_NUM = 3  # alpha = 3/10
_EWMA_DEN = 10
_HOUR_US = 3_600_000_000
_MAD_K_X10000 = 44_478  # 3 * 1.4826 robust-z cutoff, scaled by 1e4


# ---------------------------------------------------------------------------
# events_ewma — exact fixed-point EWMA of the hourly count series per type
# ---------------------------------------------------------------------------


def q_events_ewma(sf_dir: str):
    """EWMA level per event type over the dense (zero-filled) hourly series:
    s₀ = x₀·10⁶; sₜ = (3·xₜ·10⁶ + 7·sₜ₋₁) // 10 — a PURE-integer fixed-point
    recurrence (α = 0.3), so the sequential scan is exactly replayable by a
    recursive CTE with no float-order hazard. Reports the final level per
    type — the "current baseline" an alerting rule compares against.

    Scale shape: one (type, hour) count combiner per batch → ONE tiny
    exchange bounded by |types| × calendar-hour domain → per-type integer
    recurrence on the driver over that bounded series."""

    def partial(t: pa.Table) -> pa.Table:
        hrs = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        df = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False), "hr": hrs})
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| x calendar-hour domain
        .groupby(["event_type", "hr"])["cnt"]
        .sum()
    )
    h0 = int(hist.index.get_level_values("hr").min())
    h1 = int(hist.index.get_level_values("hr").max())
    span = h1 - h0 + 1
    rows = []
    for et in sorted(hist.index.get_level_values("event_type").unique()):
        x = np.zeros(span, dtype=np.int64)
        sub = hist.loc[et]
        x[sub.index.to_numpy(np.int64) - h0] = sub.to_numpy(np.int64)
        s = int(x[0]) * _EWMA_SCALE
        for v in x[1:]:
            s = (_EWMA_NUM * int(v) * _EWMA_SCALE + (_EWMA_DEN - _EWMA_NUM) * s) // _EWMA_DEN
        rows.append((et, s, int(x[-1])))
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "ewma_fp6": np.array([r[1] for r in rows], np.int64),
            "last_cnt": np.array([r[2] for r in rows], np.int64),
            "n_hours": np.full(len(rows), span, np.int64),
        }
    )


ORACLES55["events_ewma"] = f"""
WITH RECURSIVE h AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
types AS (SELECT DISTINCT event_type FROM h),
grid AS (
  SELECT t.event_type, g.h0 + CAST(r.range AS BIGINT) AS hr,
         CAST(r.range AS BIGINT) AS step
  FROM g CROSS JOIN range(0, 200000) r CROSS JOIN types t
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.event_type, grid.step, CAST(coalesce(h.cnt, 0) AS BIGINT) AS cnt
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.hr = grid.hr
),
rec AS (
  SELECT event_type, step, cnt, cnt * {_EWMA_SCALE} AS s
  FROM x WHERE step = 0
  UNION ALL
  SELECT x.event_type, x.step, x.cnt,
         ({_EWMA_NUM} * x.cnt * {_EWMA_SCALE}
          + {_EWMA_DEN - _EWMA_NUM} * rec.s) // {_EWMA_DEN}
  FROM rec JOIN x ON x.event_type = rec.event_type AND x.step = rec.step + 1
)
SELECT rec.event_type,
       CAST(rec.s AS BIGINT) AS ewma_fp6,
       CAST(rec.cnt AS BIGINT) AS last_cnt,
       CAST((SELECT h1 - h0 + 1 FROM g) AS BIGINT) AS n_hours
FROM rec
WHERE rec.step = (SELECT h1 - h0 FROM g)
ORDER BY rec.event_type"""


# ---------------------------------------------------------------------------
# events_mad_anomaly — robust outlier counts via median absolute deviation
# ---------------------------------------------------------------------------


def q_events_mad_anomaly(sf_dir: str):
    """Robust anomaly screen per event type: med = lower median of integer
    cents, MAD = lower median of |cents − med|, anomaly ⟺
    |cents − med| · 10⁴ > 44478 · MAD (the |z_robust| > 3 rule with
    1.4826·MAD as the σ-consistent scale) — PURE integer end to end.

    Scale shape: everything derives from ONE (type, cents) histogram
    combiner (the repo's bounded-cents-domain precedent): medians, the MAD
    (deviation histogram is a driver-side fold of the value histogram), and
    the anomaly count — rows are read once and never shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "cents": cents}
        )
        g = df.groupby(["event_type", "cents"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| x cents domain
        .groupby(["event_type", "cents"])["cnt"]
        .sum()
    )

    def lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        # k-th smallest with k = ceil(n/2) over the sorted histogram
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], cnts[order]
        n = int(c.sum())
        k = (n + 1) // 2
        return int(v[int(np.argmax(np.cumsum(c) >= k))])

    rows = []
    for et in sorted(hist.index.get_level_values("event_type").unique()):
        sub = hist.loc[et]
        vals = sub.index.to_numpy(np.int64)
        cnts = sub.to_numpy(np.int64)
        med = lower_median(vals, cnts)
        dev = np.abs(vals - med)
        mad = lower_median(dev, cnts)
        n = int(cnts.sum())
        n_anom = int(cnts[dev * 10_000 > _MAD_K_X10000 * mad].sum())
        rows.append((et, med, mad, n_anom, n))
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "med_cents": np.array([r[1] for r in rows], np.int64),
            "mad_cents": np.array([r[2] for r in rows], np.int64),
            "n_anomalies": np.array([r[3] for r in rows], np.int64),
            "n": np.array([r[4] for r in rows], np.int64),
        }
    )


ORACLES55["events_mad_anomaly"] = f"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, cents AS med
  FROM (
    SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM c
  ) WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT c.event_type, abs(c.cents - med.med) AS d, med.med
  FROM c JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, d AS mad
  FROM (
    SELECT event_type, d,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev
  ) WHERE rn = (n + 1) // 2
)
SELECT dev.event_type,
       CAST(any_value(dev.med) AS BIGINT) AS med_cents,
       CAST(any_value(mad.mad) AS BIGINT) AS mad_cents,
       CAST(count(*) FILTER (dev.d * 10000 > {_MAD_K_X10000} * mad.mad)
            AS BIGINT) AS n_anomalies,
       CAST(count(*) AS BIGINT) AS n
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
ORDER BY dev.event_type"""


QUERIES55 = {
    "events_ewma": q_events_ewma,
    "events_mad_anomaly": q_events_mad_anomaly,
}
