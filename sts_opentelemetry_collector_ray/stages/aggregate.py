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


OVERFLOW_ATTR = "__overflow__"


def cardinality_cap(
    ds: "ray.data.Dataset",
    metric_col: str = "role",
    attr_col: str = "conv_id",
    k: int = 50,
) -> "ray.data.Dataset":
    """Metric-attribute cardinality limiting, batch form: per ``metric_col``,
    keep the ``k`` highest-count ``attr_col`` values (ties broken by attr asc)
    and fold every other value into one ``__overflow__`` series — the batch
    analogue of the collector's bounded metric-cardinality protection (the
    streaming limiter keeps the first-seen K attribute sets and routes the rest
    to an overflow series; a deterministic batch replay elects by count).

    Output: (metric_col, attr_col, n) with at most k+1 attr values per metric.

    Scale shape: the corpus-sized work is the (metric, attr) count — the
    existing combiner-then-tiny-shuffle `sink_counts`. The keep set is found
    with a per-block partial top-k (each block forwards ≤ |metrics|·k rows)
    finalized per metric over those bounded partials, then broadcast; the
    remap + overflow fold re-aggregates only already-aggregated rows. The
    count aggregate is executed twice (keep-set pass, remap pass) — two
    streaming passes instead of materializing |metrics|×|attrs| rows.
    """
    import numpy as np
    import pandas as pd
    import ray

    counts = sink_counts(ds, [metric_col, attr_col])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n", attr_col], ascending=[False, True], kind="mergesort"
        )
        return df.groupby(metric_col, as_index=False, sort=False).head(k)

    top = (
        counts.map_batches(partial_topk, batch_format="pandas")
        .groupby(metric_col)
        .map_groups(partial_topk, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |metrics| · k rows
    )
    top_ref = ray.put(top[[metric_col, attr_col]].assign(_keep=True))

    def remap(df: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(top_ref)
        m = df.merge(keep, on=[metric_col, attr_col], how="left")
        attr = np.where(
            m["_keep"].fillna(False).to_numpy(dtype=bool),
            m[attr_col].to_numpy(),
            OVERFLOW_ATTR,
        )
        out = pd.DataFrame(
            {metric_col: m[metric_col], attr_col: attr, "n_part": m["n"]}
        )
        # fold this batch's overflow rows before the exchange (combiner)
        return out.groupby([metric_col, attr_col], as_index=False)["n_part"].sum()

    return (
        counts.map_batches(remap, batch_format="pandas")
        .groupby([metric_col, attr_col])
        .aggregate(Sum("n_part", alias_name="n"))
    )
