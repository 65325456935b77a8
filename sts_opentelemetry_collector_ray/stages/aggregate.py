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


ROLLUP_ALL = "__all__"
ROLLUP_ALL_HOUR = -1


def rollup_hourly(ds: "ray.data.Dataset") -> "pa.Table":
    """ROLLUP(event_type, hour) counts + exact value sums — the OLAP-cube
    aggregation a metrics backend materializes at multiple granularities
    (per-type-per-hour, per-type, grand total), in ONE pass over the data.

    Money-style values are summed as integer cents (floor(value·100 + 0.5)) so
    the sum is exact under any summation order — the same trick as the rolling
    window aggregate; coarser levels are then derived by re-aggregating the
    FINEST level's partials (bounded: |types|·|hours| rows), never by a second
    scan. Sentinels: event_type='__all__', hour_us=-1 mark rolled-up levels.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())  # us since epoch
        hour_us = pc.multiply(pc.divide(ts, 3600_000_000), 3600_000_000)
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "hour_us": hour_us,
                    "cents": pa.array(cents),
                }
            )
            .group_by(["event_type", "hour_us"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["event_type", "hour_us", "c_p", "n_p"])

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_us"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("c_p", alias_name="value_cents"))
        .to_pandas()  # bounded: |types| × |hours|
    )
    lvl1 = (
        finest.groupby("event_type", as_index=False)[["n", "value_cents"]]
        .sum()
        .assign(hour_us=ROLLUP_ALL_HOUR)
    )
    lvl0 = pd.DataFrame(
        {
            "event_type": [ROLLUP_ALL],
            "hour_us": [ROLLUP_ALL_HOUR],
            "n": [finest["n"].sum()],
            "value_cents": [finest["value_cents"].sum()],
        }
    )
    cols = ["event_type", "hour_us", "n", "value_cents"]
    out = pd.concat([finest[cols], lvl1[cols], lvl0[cols]], ignore_index=True)
    return pa.Table.from_pandas(
        out.astype({"hour_us": "int64", "n": "int64", "value_cents": "int64"}),
        preserve_index=False,
    ).replace_schema_metadata(None)
