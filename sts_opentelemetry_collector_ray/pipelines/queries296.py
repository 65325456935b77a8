"""Driver-contract queries, wave 296 — streaming-telemetry health
operators: per-shard watermark lag (the Flink/Beam min-watermark view
of the event stream sharded by user hash) and the ingestion-disorder
profile (out-of-order arrivals measured against the event_id ingestion
sequence). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES296: dict[str, str] = {}

_WM_SHARDS = 16


# ---------------------------------------------------------------------------
# events_shard_watermarks — min-watermark and per-shard lag
# ---------------------------------------------------------------------------


def q_events_shard_watermarks(sf_dir: str):
    """Watermark view of the stream sharded by user_id % 16: each
    shard's high-water mark is its max event ts; the GLOBAL watermark is
    the minimum of those (no window behind it may still change); each
    shard's lag is how far it runs ahead of the slowest shard. Pure
    integer max/min folds. Per shard: shard, n_events, max_ts_us,
    watermark_us (repeated), lead_us.

    Scale shape: one (shard -> n, max) combiner per batch; the driver
    folds 16 x 2 scalars."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        sh = (
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % _WM_SHARDS
        )
        df = pd.DataFrame({"shard": sh, "us": us})
        g = df.groupby("shard").agg(n=("us", "size"), mx=("us", "max"))
        return g.reset_index().astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("shard")
        .agg(n=("n", "sum"), mx=("mx", "max"))
        .sort_index()
    )
    cols = ["shard", "n_events", "max_ts_us", "watermark_us", "lead_us"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    wm = int(m["mx"].min())
    out = pd.DataFrame(
        {
            "shard": m.index.to_numpy(np.int64),
            "n_events": m["n"].to_numpy(np.int64),
            "max_ts_us": m["mx"].to_numpy(np.int64),
            "watermark_us": np.int64(wm),
            "lead_us": m["mx"].to_numpy(np.int64) - wm,
        }
    )
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES296["events_shard_watermarks"] = f"""
WITH s AS (
  SELECT CAST(user_id % {_WM_SHARDS} AS BIGINT) AS shard,
         CAST(count(*) AS BIGINT) AS n,
         CAST(max(epoch_us(ts)) AS BIGINT) AS mx
  FROM events GROUP BY 1
),
wm AS (SELECT CAST(min(mx) AS BIGINT) AS w FROM s)
SELECT s.shard, s.n AS n_events, s.mx AS max_ts_us,
       wm.w AS watermark_us, s.mx - wm.w AS lead_us
FROM s, wm
ORDER BY s.shard"""


# ---------------------------------------------------------------------------
# events_ingestion_disorder — out-of-order arrivals vs ingestion sequence
# ---------------------------------------------------------------------------


def q_events_ingestion_disorder(sf_dir: str):
    """Ingestion disorder: treating event_id as the arrival sequence,
    count adjacent arrivals whose event time regresses
    (ts_{i+1} < ts_i), the worst single regression, and the total
    late skew — the operational signal that drives watermark-delay
    tuning. Pure integer folds. One row: n_pairs, n_inversions,
    max_regression_us, sum_regression_us, disorder_micro.

    Scale shape: ONE range-partitioned sort on event_id, per-block
    vectorized diffs + (first, last) boundary partials stitched on the
    driver (the `events_greenwood` idiom)."""

    def block_fold(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        if len(eid) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ("k", "inv", "mx", "sm", "np_",
                           "first_id", "first_us", "last_id", "last_us")}
            )
        d = np.diff(us)
        neg = d < 0
        return pd.DataFrame(
            {
                "k": [np.int64(0)],
                "inv": [np.int64(int(neg.sum()))],
                "mx": [np.int64(int((-d[neg]).max()) if neg.any() else 0)],
                "sm": [np.int64(int((-d[neg]).sum()) if neg.any() else 0)],
                "np_": [np.int64(len(d))],
                "first_id": [np.int64(eid[0])],
                "first_us": [np.int64(us[0])],
                "last_id": [np.int64(eid[-1])],
                "last_us": [np.int64(us[-1])],
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
        )
        .sort("event_id")
        .map_batches(block_fold, batch_format="pyarrow")
        .to_pandas()
        .sort_values("first_id")
        .reset_index(drop=True)
    )
    cols = [
        "n_pairs", "n_inversions", "max_regression_us",
        "sum_regression_us", "disorder_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    inv = int(parts["inv"].sum())
    mx = int(parts["mx"].max())
    sm = int(parts["sm"].sum())
    n_pairs = int(parts["np_"].sum())
    # boundary pairs between consecutive sorted blocks
    b = (
        parts["first_us"].to_numpy(np.int64)[1:]
        - parts["last_us"].to_numpy(np.int64)[:-1]
    )
    neg = b < 0
    inv += int(neg.sum())
    if neg.any():
        mx = max(mx, int((-b[neg]).max()))
        sm += int((-b[neg]).sum())
    n_pairs += len(b)
    if n_pairs == 0:
        return empty
    disorder = float(inv) / float(n_pairs)
    return pd.DataFrame(
        [
            (
                np.int64(n_pairs), np.int64(inv), np.int64(mx), np.int64(sm),
                np.int64(np.floor(disorder * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES296["events_ingestion_disorder"] = """
WITH s AS (
  SELECT epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (ORDER BY event_id) AS prev
  FROM events
),
d AS (SELECT us - prev AS dd FROM s WHERE prev IS NOT NULL),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN dd < 0 THEN 1 ELSE 0 END) AS BIGINT) AS inv,
         CAST(coalesce(max(CASE WHEN dd < 0 THEN -dd END), 0) AS BIGINT)
           AS mx,
         CAST(coalesce(sum(CASE WHEN dd < 0 THEN -dd END), 0) AS BIGINT)
           AS sm
  FROM d
)
SELECT n_pairs, inv AS n_inversions, mx AS max_regression_us,
       sm AS sum_regression_us,
       CAST(floor(CAST(inv AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS disorder_micro
FROM agg
WHERE n_pairs > 0"""


QUERIES296 = {
    "events_shard_watermarks": q_events_shard_watermarks,
    "events_ingestion_disorder": q_events_ingestion_disorder,
}
