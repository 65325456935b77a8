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

# Vectorized model lookup: 5-entry dictionary via pc.index_in + take instead of
# a per-row dict.get loop.
_TYPE_KEYS = pa.array(list(TYPE_MODEL.keys()), pa.string())
_MODEL_VALUES = pa.array(list(TYPE_MODEL.values()) + ["gauge"], pa.string())

# Summary model quantile levels (ValueAtQuantiles, summary_metrics.go:36-38).
SUMMARY_QUANTILES = (0.5, 0.9, 0.99)


def dispatch_batch(t: pa.Table) -> pa.Table:
    """Adds the model column + model-specific derived columns.

    Shared: ``model``, ``hist_bucket`` (searchsorted over explicit bounds ≡
    SearchFloat64s), ``exp_bucket`` (base-2 ceil-log2 bucket index).

    Per-model payload analogues of the reference's typed tables (NULL for rows
    of other models, like datapoints landing in their one typed table):

    - histogram (histogram_metrics.go:36-37): ``count``/``sum_val`` +
      ``bucket_counts`` one-hot over len(bounds)+1 buckets.
    - exp_histogram (exponential_histogram_metrics.go:36-41): ``scale`` (0),
      ``zero_count``, ``pos_offset``/``pos_bucket_counts`` and
      ``neg_offset``/``neg_bucket_counts`` for the value's sign side.
    - summary (summary_metrics.go:34-38): ``count``/``sum_val`` +
      ``value_at_quantiles`` at the 0.5/0.9/0.99 levels (single-point summary:
      every quantile equals the value).

    All payloads are closed-form over ``value`` so DuckDB oracles replay them;
    list-shaped fields are canonical JSON strings (the driver gate compares
    pandas frames, where raw list cells defeat sort/equality).
    """
    import pyarrow.compute as pc

    et = t["event_type"]
    value = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(t)
    idx = pc.fill_null(pc.index_in(et, value_set=_TYPE_KEYS), len(TYPE_MODEL))
    model_arr = _MODEL_VALUES.take(idx)
    model = model_arr.to_numpy(zero_copy_only=False)
    bucket = np.searchsorted(_HIST_BOUNDS, value, side="left").astype(np.int32)
    with np.errstate(divide="ignore"):
        log2v = np.ceil(np.log2(np.maximum(np.abs(value), 1e-300)))
    exp_bucket = np.where(value > 0, log2v, 0).astype(np.int32)

    is_hist = model == "histogram"
    is_exp = model == "exp_histogram"
    is_sum = model == "summary"
    is_dist = is_hist | is_exp | is_sum

    def masked(mask: np.ndarray, vals: np.ndarray) -> np.ndarray:
        """NULL-gate a STRING payload column (None rows are NA-safe in the
        pandas-frame driver compare; numeric columns instead default to 0 —
        NULL numerics surface as NaN where NaN != NaN breaks value equality)."""
        out = np.full(n, None, dtype=object)
        out[mask] = vals[mask]
        return out

    # histogram: one-hot bucket_counts JSON via a (len(bounds)+1)-entry LUT
    nb = len(_HIST_BOUNDS) + 1
    lut = np.array(
        ["[" + ",".join("1" if j == b else "0" for j in range(nb)) + "]"
         for b in range(nb)],
        dtype=object,
    )
    bucket_counts = masked(is_hist, lut[bucket])

    # exp_histogram: sign-side offsets + single-bucket counts
    pos = is_exp & (value > 0)
    neg = is_exp & (value < 0)
    zero_count = np.where(is_exp & (value == 0), 1, 0).astype(np.int64)
    pos_offset = np.where(pos, exp_bucket, 0).astype(np.int64)
    neg_offset = np.where(neg, log2v, 0).astype(np.int64)
    pos_counts = masked(is_exp, np.where(pos, "[1]", "[]").astype(object))
    neg_counts = masked(is_exp, np.where(neg, "[1]", "[]").astype(object))

    # summary: single-point ValueAtQuantiles (every quantile level = the value)
    vaq = np.full(n, None, dtype=object)
    if is_sum.any():
        vs = np.char.mod("%.6f", np.round(value[is_sum], 6))
        body = vs
        acc = None
        for q in SUMMARY_QUANTILES:
            piece = np.char.add(np.char.add(f'{{"q":{q},"v":', body), "}")
            acc = piece if acc is None else np.char.add(np.char.add(acc, ","), piece)
        vaq[is_sum] = np.char.add(np.char.add("[", acc), "]").astype(object)

    out = t.append_column("model", model_arr)
    out = out.append_column("hist_bucket", pa.array(bucket))
    out = out.append_column("exp_bucket", pa.array(exp_bucket))
    out = out.append_column(
        "count", pa.array(is_dist.astype(np.int64), pa.int64())
    )
    out = out.append_column(
        "sum_val", pa.array(np.where(is_dist, value, 0.0), pa.float64())
    )
    out = out.append_column("bucket_counts", pa.array(bucket_counts, pa.string()))
    out = out.append_column("scale", pa.array(np.zeros(n, np.int64), pa.int64()))
    out = out.append_column("zero_count", pa.array(zero_count, pa.int64()))
    out = out.append_column("pos_offset", pa.array(pos_offset, pa.int64()))
    out = out.append_column("pos_bucket_counts", pa.array(pos_counts, pa.string()))
    out = out.append_column("neg_offset", pa.array(neg_offset, pa.int64()))
    out = out.append_column("neg_bucket_counts", pa.array(neg_counts, pa.string()))
    out = out.append_column("value_at_quantiles", pa.array(vaq, pa.string()))
    return out


def metrics_dispatch(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(dispatch_batch, batch_format="pyarrow")


def write_typed_sinks(ds: "ray.data.Dataset", out_dir: str) -> None:
    """One parquet directory per metric model (the 5 typed tables)."""
    metrics_dispatch(ds).write_parquet(
        out_dir, partition_cols=["model"], mode="overwrite"
    )
