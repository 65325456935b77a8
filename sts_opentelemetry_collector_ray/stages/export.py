"""Export-side operators — topology collections, resource dedup, usage metering,
deterministic sampling.

- `topology_collections` — the ststopologyexporter analogue: group routed rows by
  tenant key, build one deterministic collection per key (components + relations
  sorted by external id before emit — reference:
  exporter/ststopologyexporter/exporter.go:65-236, internal/topology.go:29-355).
- `resource_dedup` — the clickhousestsexporter resources path: resource ref = hash
  of the attribute projection, exact dedup per ref (exporter_resources.go:26-63,
  100-130; ref is a UUID over xxhash there, FNV-1a64 here).
- `usage_bytes` — the stsusageprocessor analogue: pass-through byte metering,
  reduced per key instead of a global counter (processor/stsusageprocessor/
  stsusage_processor.go:22-28).
- `hash_sample` — tail-sampling analogue (agent-otel-builder.yaml:44) made
  deterministic: keep rows whose FNV-1a32(conv_id ⊕ turn_idx) mod 100 < pct —
  reproducible across engines (unlike RNG sampling), so it gets a SQL oracle.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import fnv1a32_arrow, fnv1a64_array


def topology_collections(routed: "ray.data.Dataset", key_col: str = "role") -> "ray.data.Dataset":
    """One row per (tenant key): counts + deterministically ordered id lists.

    The reference groups metrics by sts_api_key and POSTs one JSON collection per
    key with components/relations sorted by ExternalId (topology.go:335-355); here
    the tenant key is a routed-row column and the payload is the canonical JSON of
    the sorted collection. A per-batch DISTINCT combiner runs before the tenant
    group, so the shuffle and the per-key task carry unique ids only — the
    per-key memory bound is the payload itself, the same bound the reference's
    per-request POST body imposes (a tenant whose id set doesn't fit one
    collection doesn't fit one POST either)."""

    def distinct_ids(t: pa.Table) -> pa.Table:
        sub = pa.table(
            {
                key_col: t[key_col],
                "external_id": t["external_id"],
                "is_rel": pc.is_valid(t["source_id"].combine_chunks()),
            }
        ).filter(pc.is_valid(t["external_id"].combine_chunks()))
        return sub.group_by([key_col, "external_id", "is_rel"]).aggregate([])

    def build(g: pd.DataFrame) -> pd.DataFrame:
        key = g[key_col].iloc[0]
        comps = sorted(g.loc[~g["is_rel"], "external_id"].unique())
        rels = sorted(g.loc[g["is_rel"], "external_id"].unique())
        payload = json.dumps(
            {"components": comps, "relations": rels}, separators=(",", ":")
        )
        return pd.DataFrame(
            {
                "key": [key],
                "n_components": [len(comps)],
                "n_relations": [len(rels)],
                "payload": [payload],
            }
        )

    return (
        routed.map_batches(distinct_ids, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(build, batch_format="pandas")
    )


def resource_dedup(
    ds: "ray.data.Dataset", attr_cols: list[str], num_buckets: int = 64
) -> "ray.data.Dataset":
    """(resource_ref, attrs...) — exact dedup by the FNV-1a64 of the sorted
    attribute projection (K5). Output one row per distinct resource."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        canon = df[attr_cols[0]].astype(str)
        for c in attr_cols[1:]:
            canon = canon + "\x1f" + df[c].astype(str)
        refs = fnv1a64_array(canon.to_numpy(dtype=object))
        df = df[attr_cols].assign(resource_ref=refs).drop_duplicates("resource_ref")
        bucket = (df["resource_ref"].to_numpy(dtype=np.uint64) % num_buckets).astype(np.int32)
        return df.assign(_bucket=bucket)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("resource_ref").drop(columns=["_bucket"])

    pre = ds.map_batches(local, batch_format="pandas")
    return pre.groupby("_bucket").map_groups(bucket, batch_format="pandas")


def usage_bytes(routed: "ray.data.Dataset", key: str = "sink") -> "ray.data.Dataset":
    """(key, total_bytes): UTF-8 byte metering of the text payload per sink —
    per-batch partials then a tiny groupby-sum (A7 as a keyed metric)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        nbytes = pc.coalesce(
            pc.binary_length(pc.cast(t["text"], pa.binary())), pa.scalar(0, pa.int32())
        )
        tt = pa.table({key: t[key], "b": nbytes})
        g = tt.group_by([key]).aggregate([("b", "sum")])
        return g.rename_columns([key, "pb"])

    partials = routed.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key).aggregate(Sum("pb", alias_name="total_bytes"))


def hash_sample(
    ds: "ray.data.Dataset",
    pct: int = 10,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
) -> "ray.data.Dataset":
    """Deterministic row sampling: FNV-1a32(conv_id + ':' + turn_idx) % 100 < pct."""

    def fn(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t[conv_col], pc.cast(t[idx_col], pa.string()), ":"
        )
        h = fnv1a32_arrow(key.combine_chunks()) % np.uint64(100)
        return t.filter(pa.array(h < pct))

    return ds.map_batches(fn, batch_format="pyarrow")
