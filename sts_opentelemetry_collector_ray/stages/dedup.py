"""Dedup stage — first-wins suppression by projection hash.

The reference's deduplicator is a TTL'd LRU keyed by a canonical hash of only the
fields each mapping references; a row is published if its key is new or older than
TTL×refreshFraction (reference: connector/topologyconnector/internal/deduplicator.go:
52-205). In a batch run the TTL window degenerates to once-per-run first-wins — an
anti-join of each row against the set of earlier rows with the same key, under the
deterministic order (conv_id, turn_idx, data_source).

Scale design (two-level, ONE shuffle, no per-key Python, single linear lineage):

1. **Local combiner** — each `map_batches` task collapses duplicates *within its
   batch* vectorized (pandas stable sort + `drop_duplicates(keep='first')`), shrinking
   the shuffle to ≤ one row per (key, batch).
2. **Hash-bucket exchange** — `bucket = dedup_key % B` co-locates equal keys;
   `groupby("_bucket").map_groups` runs ONE vectorized pandas first-wins per bucket
   (B ≈ a few × cluster cores), never per key. Bucket sizes are hash-uniform; B bounds
   per-task memory (pick B so survivors/B fits a worker heap at 100 TB).

Rows with a null key (DELETE actions, error rows) bypass the gate — the reference only
dedups CREATE payloads (mapping_handler.go:196-203). They ride through the same
shuffle in *salted* buckets ``B + hash(conv_id) % B`` (spread evenly, never compared)
rather than a second dataset branch: branching a lazy Dataset would re-execute the
whole upstream per branch and double every actor pool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_ORDER = ["conv_id", "turn_idx", "data_source"]


def filter_valid(ds: "ray.data.Dataset", col: str, valid: bool = True) -> "ray.data.Dataset":
    """Vectorized null/non-null filter (Arrow kernel inside map_batches)."""

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t[col])
        return t.filter(mask if valid else pc.invert(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def _local_first(key: str, num_buckets: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        keyvals = df[key]
        keyed_mask = keyvals.notna().to_numpy()
        keyed = df.loc[keyed_mask]
        passthrough = df.loc[~keyed_mask]
        keyed = keyed.sort_values(_ORDER, kind="mergesort").drop_duplicates(
            key, keep="first"
        )
        keyed = keyed.assign(
            _bucket=(keyed[key].to_numpy(dtype=np.uint64) % num_buckets).astype(np.int32)
        )
        if len(passthrough):
            salt = (
                pd.util.hash_array(passthrough["conv_id"].to_numpy(dtype=object))
                % num_buckets
            ).astype(np.int32) + np.int32(num_buckets)
            passthrough = passthrough.assign(_bucket=salt)
        else:
            passthrough = passthrough.assign(
                _bucket=np.empty(0, dtype=np.int32)
            )
        out = pd.concat([keyed, passthrough], ignore_index=True)
        # Unify the key dtype across blocks (uint64 + nulls would otherwise flip
        # between uint64/float64/object per block). Equality was already decided
        # above; past this point the key is informational only.
        out[key] = out[key].astype("float64")
        return out

    return fn


def _bucket_first(key: str, num_buckets: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) and int(df["_bucket"].iloc[0]) >= num_buckets:
            return df.drop(columns=["_bucket"])  # salted passthrough bucket
        df = df.sort_values(_ORDER, kind="mergesort").drop_duplicates(key, keep="first")
        return df.drop(columns=["_bucket"])

    return fn


def dedup_first_wins(
    ds: "ray.data.Dataset", key: str = "dedup_key", num_buckets: int = 64
) -> "ray.data.Dataset":
    pre = ds.map_batches(_local_first(key, num_buckets), batch_format="pandas")
    return pre.groupby("_bucket").map_groups(
        _bucket_first(key, num_buckets), batch_format="pandas"
    )
