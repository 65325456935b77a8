"""Aggregate stage — per-sink grouped counts with partial pre-aggregation.

The analogue of the reference's service-graph series counters: ``reqTotal[key] +=
count`` per NUL-separated series key, flushed as cumulative metrics (reference:
connector/stsservicegraphconnector/connector.go:424-479, 621-643). Batch translation:
``groupby(sink, role, tool).count()``.

Scale pattern (the wide shuffle of the flagship pipeline): each `map_batches` task
first collapses its batch to one row per key via an Arrow hash-group-by (the
combiner), so the global `groupby().aggregate(Sum)` shuffles ONLY per-batch partials —
cardinality ≈ |keys| × |batches|, not |rows|.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

DEFAULT_KEYS = ["sink", "role", "tool"]


def _partial_counts(keys: list[str]):
    def inner(batch: pa.Table) -> pa.Table:
        sub = batch.select(keys)
        grouped = sub.group_by(keys).aggregate([([], "count_all")])
        return grouped.rename_columns(keys + ["n_partial"])

    return inner


def sink_counts(
    ds: "ray.data.Dataset", keys: list[str] | None = None
) -> "ray.data.Dataset":
    """(keys..., n) exact counts; combiner-in-map_batches then a tiny groupby-sum."""
    keys = keys or DEFAULT_KEYS
    partials = ds.map_batches(_partial_counts(keys), batch_format="pyarrow")
    out = partials.groupby(keys).aggregate(Sum("n_partial", alias_name="n"))
    return out
