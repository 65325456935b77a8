"""Driver-contract queries, wave 113 — video flicker screen (frame-to-frame
brightness jumps per clip: the strobe / broken-encode detector, real decode
with a closed-form oracle) and exact trimmed mean (the 10%-each-side robust
KPI, PURE integer from the cents histogram). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES113: dict[str, str] = {}

_FLK_T = 100  # per-pixel jump threshold
_TM_TRIM = 10  # trim n//10 rows on each side


# ---------------------------------------------------------------------------
# video_flicker — per-clip brightness-jump detection
# ---------------------------------------------------------------------------


def q_video_flicker(sf_dir: str):
    """REAL flicker path: deterministic frame stacks keyed by doc_id →
    actor-pool per-frame totals + |Δ| jump counts
    (stages/multimodal.py::VideoFlickerActor). On this corpus only the blue
    channel's (id·11 + f·29) mod 256 sawtooth moves the totals, so the
    oracle replays the jumps closed-form per (id, frame) with no pixel
    unnesting. Exact integers throughout."""
    from ..stages.multimodal import VideoFlickerActor, synthesize_video_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_video_batch, batch_format="pyarrow")
    return media.map_batches(
        VideoFlickerActor,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 2),
        num_cpus=1,
    ).select_columns(["media_id", "n_flicker", "max_jump"])


def _flicker_oracle() -> str:
    from ..stages.multimodal import VID_FRAMES, VID_H, VID_W

    px = VID_H * VID_W
    return f"""
WITH j AS (
  SELECT d.doc_id,
         abs(((d.doc_id * 11 + (f.f + 1) * 29) % 256)
             - ((d.doc_id * 11 + f.f * 29) % 256)) * {px} AS jump
  FROM documents d, unnest(range(0, {VID_FRAMES - 1})) AS f(f)
)
SELECT doc_id AS media_id,
       CAST(count(*) FILTER (jump > {_FLK_T} * {px}) AS BIGINT) AS n_flicker,
       CAST(max(jump) AS BIGINT) AS max_jump
FROM j GROUP BY doc_id"""


ORACLES113["video_flicker"] = _flicker_oracle()


# ---------------------------------------------------------------------------
# events_trimmed_mean — exact 10%-trimmed mean per event type
# ---------------------------------------------------------------------------


def q_events_trimmed_mean(sf_dir: str):
    """Robust KPI: per event type, drop the n//10 smallest and n//10
    largest cents observations and average the rest — the trimmed mean
    that survives fat tails without winsorize's value substitution. PURE
    integer: boundary bins contribute partially via cumulative-count
    arithmetic, ties are value-identical so the result is order-free.

    Scale shape: ONE (type, cents) histogram combiner (the MAD-anomaly
    precedent) — rows are read once and never shuffle; the driver walks
    each type's bounded histogram with two cumsums."""

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": np.asarray(
                    t["event_type"].to_numpy(zero_copy_only=False)
                ),
                "cents": cents,
            }
        )
        g = (
            df.groupby(["event_type", "cents"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| × cents domain
        .groupby(["event_type", "cents"])["cnt"]
        .sum()
    )
    rows = []
    for ty in sorted(hist.index.get_level_values(0).unique()):
        h = hist.xs(ty).sort_index()
        vals = h.index.to_numpy(np.int64)
        cnt = h.to_numpy(np.int64)
        n = int(cnt.sum())
        k = n // _TM_TRIM
        total = int((vals * cnt).sum())
        # sum of the k smallest: full bins below the boundary + a partial bin
        cum = np.cumsum(cnt)
        if k > 0:
            i = int(np.searchsorted(cum, k))
            low = int((vals[:i] * cnt[:i]).sum()) + int(vals[i]) * (
                k - (int(cum[i - 1]) if i else 0)
            )
            cum_hi = np.cumsum(cnt[::-1])
            j = int(np.searchsorted(cum_hi, k))
            vals_r, cnt_r = vals[::-1], cnt[::-1]
            high = int((vals_r[:j] * cnt_r[:j]).sum()) + int(vals_r[j]) * (
                k - (int(cum_hi[j - 1]) if j else 0)
            )
        else:
            low = high = 0
        kept = n - 2 * k
        rows.append(
            {
                "event_type": ty,
                "n": n,
                "n_trimmed": 2 * k,
                "trimmed_mean_micro": (total - low - high)
                * 1_000_000
                // max(kept, 1),
            }
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n", "n_trimmed", "trimmed_mean_micro"]
    )
    return out.astype({"n": np.int64, "n_trimmed": np.int64, "trimmed_mean_micro": np.int64})


ORACLES113["events_trimmed_mean"] = f"""
WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(2 * (max(n) // {_TM_TRIM}) AS BIGINT) AS n_trimmed,
       CAST(sum(cents) FILTER (rn > n // {_TM_TRIM}
                               AND rn <= n - n // {_TM_TRIM}) * 1000000
            // greatest(max(n) - 2 * (max(n) // {_TM_TRIM}), 1) AS BIGINT)
         AS trimmed_mean_micro
FROM r GROUP BY event_type"""


QUERIES113 = {
    "video_flicker": q_video_flicker,
    "events_trimmed_mean": q_events_trimmed_mean,
}
