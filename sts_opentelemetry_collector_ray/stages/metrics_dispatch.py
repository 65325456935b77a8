"""Metric-type dispatch — the ClickHouse metrics exporter analogue (K4).

The reference dispatches each metric datapoint into one of 5 typed models
(gauge/sum/histogram/exponential histogram/summary), each with its own table
schema and batched insert (reference:
exporter/clickhousestsexporter/internal/metrics_model.go:21-60 and the five
*_metrics.go models).

Translation over the `events` stream: `event_type` plays the metric-type role;
one vectorized pass splits a batch into per-type Arrow tables with per-type
schemas, written side by side (one logical dataset per sink, K4's "5 tables").
The dispatch is a column-mask split inside `map_batches` — no shuffle; the
per-type parquet directories are the typed sinks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# event_type → metric model (5 models, mirroring metrics_model.go:21-29)
TYPE_MODEL = {
    "view": "gauge",
    "click": "sum",
    "purchase": "histogram",
    "signup": "exp_histogram",
    "error": "summary",
}

_HIST_BOUNDS = np.array([10.0, 50.0, 100.0, 500.0], dtype=np.float64)


def dispatch_batch(t: pa.Table) -> pa.Table:
    """Adds the model column + model-specific derived columns:

    - gauge: value as-is
    - sum: value (monotonic running sums are a downstream cumulative aggregate)
    - histogram: bucket index over explicit bounds (searchsorted)
    - exp_histogram: base-2 bucket index (ceil(log2(value)))
    - summary: value + error flag
    """
    et = t["event_type"].to_numpy(zero_copy_only=False)
    value = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    model = np.array([TYPE_MODEL.get(e, "gauge") for e in et], dtype=object)
    bucket = np.searchsorted(_HIST_BOUNDS, value, side="left").astype(np.int32)
    with np.errstate(divide="ignore"):
        exp_bucket = np.where(
            value > 0, np.ceil(np.log2(np.maximum(value, 1e-300))), 0
        ).astype(np.int32)
    out = t.append_column("model", pa.array(model, pa.string()))
    out = out.append_column("hist_bucket", pa.array(bucket))
    out = out.append_column("exp_bucket", pa.array(exp_bucket))
    return out


def metrics_dispatch(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(dispatch_batch, batch_format="pyarrow")


def write_typed_sinks(ds: "ray.data.Dataset", out_dir: str) -> None:
    """One parquet directory per metric model (the 5 typed tables)."""
    metrics_dispatch(ds).write_parquet(
        out_dir, partition_cols=["model"], mode="overwrite"
    )
