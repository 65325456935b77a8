"""Driver-contract queries, wave 91 — Tukey-fence outlier screen (exact
cents-histogram quartiles via integer rank pick, division-free ×4 fences:
the canonical IQR cleaning rule) and daily TWAP (time-weighted average of
the event value per type and day — step-function integration with exact
integer area sums; durations telescope to ≤ 1 day so cents×µs never
overflows). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES91: dict[str, str] = {}

_TWAP_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_tukey_fences — IQR outlier counts per event type
# ---------------------------------------------------------------------------


def q_events_tukey_fences(sf_dir: str):
    """Tukey screen per type: Q1/Q3 are the cents values at ranks ⌈n/4⌉ and
    ⌈3n/4⌉ of the exact value histogram (the repo's lower-quantile rank
    convention); the 1.5·IQR fences compare division-free in quarter-cents
    (4·c < 4·Q1 − 6·IQR). Reports n, quartiles and the strict outlier
    counts per side.

    Scale shape: pass 1 is the (type, cents) histogram combiner — bounded by
    the quantized value domain — reduced on the driver to |types| fence
    pairs; pass 2 broadcasts the fences in the closure and emits per-batch
    per-type outlier-count partials."""

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        c = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "typ": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "c": c,
                }
            )
            .groupby(["typ", "c"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: quantized value domain × |types|
        .groupby(["typ", "c"], as_index=False)["n"]
        .sum()
        .sort_values(["typ", "c"], kind="mergesort")
    )
    fences = {}
    for typ, g in hist.groupby("typ", sort=True):
        cents = g["c"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        q1 = int(cents[np.searchsorted(cum, (n + 3) // 4)])
        q3 = int(cents[np.searchsorted(cum, (3 * n + 3) // 4)])
        iqr = q3 - q1
        fences[typ] = (n, q1, q3, 4 * q1 - 6 * iqr, 4 * q3 + 6 * iqr)

    def out_partial(t: pa.Table) -> pd.DataFrame:
        c = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        typ = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        rows = []
        for ty in np.unique(typ):
            _, _, _, lo4, hi4 = fences[ty]
            cc = 4 * c[typ == ty]
            rows.append(
                {
                    "typ": ty,
                    "n_low": int((cc < lo4).sum()),
                    "n_high": int((cc > hi4).sum()),
                }
            )
        return pd.DataFrame(rows, columns=["typ", "n_low", "n_high"])

    outs = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(out_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| rows per block
        .groupby("typ", as_index=False)[["n_low", "n_high"]]
        .sum()
        .sort_values("typ", kind="mergesort")
    )
    return pd.DataFrame(
        {
            "event_type": outs["typ"].astype(object),
            "n": np.array([fences[t][0] for t in outs["typ"]], np.int64),
            "q1_cents": np.array([fences[t][1] for t in outs["typ"]], np.int64),
            "q3_cents": np.array([fences[t][2] for t in outs["typ"]], np.int64),
            "n_low": outs["n_low"].to_numpy(np.int64),
            "n_high": outs["n_high"].to_numpy(np.int64),
        }
    )


ORACLES91["events_tukey_fences"] = """
WITH b AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2),
t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
  SELECT event_type, cents,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum
  FROM c
),
q1 AS (
  SELECT t.event_type, min(cum.cents) AS q1
  FROM t JOIN cum ON cum.event_type = t.event_type
               AND cum.cum >= (t.n + 3) // 4
  GROUP BY 1
),
q3 AS (
  SELECT t.event_type, min(cum.cents) AS q3
  FROM t JOIN cum ON cum.event_type = t.event_type
               AND cum.cum >= (3 * t.n + 3) // 4
  GROUP BY 1
),
f AS (
  SELECT t.event_type, t.n, q1.q1, q3.q3,
         4 * q1.q1 - 6 * (q3.q3 - q1.q1) AS lo4,
         4 * q3.q3 + 6 * (q3.q3 - q1.q1) AS hi4
  FROM t JOIN q1 ON q1.event_type = t.event_type
         JOIN q3 ON q3.event_type = t.event_type
),
o AS (
  SELECT b.event_type,
         CAST(count(*) FILTER (4 * b.cents < f.lo4) AS BIGINT) AS n_low,
         CAST(count(*) FILTER (4 * b.cents > f.hi4) AS BIGINT) AS n_high
  FROM b JOIN f ON f.event_type = b.event_type
  GROUP BY 1
)
SELECT f.event_type, f.n, f.q1 AS q1_cents, f.q3 AS q3_cents,
       o.n_low, o.n_high
FROM f JOIN o ON o.event_type = f.event_type
ORDER BY f.event_type"""


# ---------------------------------------------------------------------------
# events_twap_daily — time-weighted average value per type and day
# ---------------------------------------------------------------------------


def q_events_twap_daily(sf_dir: str):
    """Daily TWAP: within each (type, day), the value is a step function —
    each event's cents value holds until the next event of that type (or the
    day end for the last one); TWAP_micro = (Σ cents·dur_us · 10⁴) //
    Σ dur_us. Durations telescope to ≤ 1 day, so every int64 product is
    safe; equal timestamps break ties by event_id (zero-duration steps).

    Scale shape: rows share ONE (type, day)-hash bucket exchange; the
    per-bucket kernel lexsorts once and derives all durations from shifted
    timestamps — buckets own their (type, day) groups completely and emit
    final rows; the tiny final division runs per result row in Python
    ints."""
    from ..functions.hashing import fnv1a64_array

    def rows(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        typ = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        day = ts // _DAY_US
        v = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        key = (pd.Series(typ).astype(str) + ":" + pd.Series(day).astype(str)
               ).to_numpy(object)
        b = (fnv1a64_array(key) % np.uint64(_TWAP_BUCKETS)).astype(np.int64)
        return pd.DataFrame(
            {
                "typ": typ,
                "day": day,
                "ts": ts,
                "eid": t["event_id"].to_numpy().astype(np.int64),
                "v": v,
                "_b": b,
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["typ", "day", "ts", "eid"], kind="mergesort")
        typ = df["typ"].to_numpy(object)
        day = df["day"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        nxt = np.empty(len(df), np.int64)
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[:-1] = (typ[:-1] == typ[1:]) & (day[:-1] == day[1:])
        nxt[:-1] = np.where(same[:-1], ts[1:], 0)
        day_end = (day + 1) * _DAY_US
        dur = np.where(same, nxt - ts, day_end - ts)
        area = v * dur  # ≤ v_max · 1 day per group: int64-safe
        agg = (
            pd.DataFrame({"typ": typ, "day": day, "area": area, "dur": dur,
                          "one": np.int64(1)})
            .groupby(["typ", "day"], sort=False, as_index=False)
            .sum()
        )
        twap = [
            int(int(a) * 10_000 // int(d)) if d else 0
            for a, d in zip(agg["area"], agg["dur"])
        ]
        return pd.DataFrame(
            {
                "event_type": agg["typ"].astype(object),
                "day": agg["day"].to_numpy(np.int64),
                "n_events": agg["one"].to_numpy(np.int64),
                "dur_us": agg["dur"].to_numpy(np.int64),
                "twap_micro": np.array(twap, np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES91["events_twap_daily"] = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, epoch_us(ts) AS ts,
         event_id,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS v
  FROM events
),
d AS (
  SELECT event_type, day, v,
         COALESCE(
           lead(ts) OVER (PARTITION BY event_type, day
                          ORDER BY ts, event_id),
           (day + 1) * {_DAY_US}) - ts AS dur
  FROM e
),
a AS (
  SELECT event_type, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(dur) AS BIGINT) AS dur_us,
         sum(v * dur) AS area
  FROM d GROUP BY 1, 2
)
SELECT event_type, day, n_events, dur_us,
       CAST(CASE WHEN dur_us = 0 THEN 0
                 ELSE (area * 10000) // dur_us END AS BIGINT) AS twap_micro
FROM a ORDER BY event_type, day"""


QUERIES91 = {
    "events_tukey_fences": q_events_tukey_fences,
    "events_twap_daily": q_events_twap_daily,
}
