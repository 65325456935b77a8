"""Envelope packing — byte-capped message coalescing (A5).

The reference merges single-element topology messages sharing (owner, dataSource,
shardId, collectionTs) into ≤768 KiB envelopes in first-seen order, using running
size estimates instead of re-serializing per merge (reference:
connector/topologyconnector/internal/message_builder.go:162-257; the 768 KiB cap
derives from Kafka's 1 MiB record limit, message_builder.go:162-171).

Ray translation: ``groupby(data_source, shard_id)`` → greedy packing inside
``map_groups`` over rows sorted in first-seen order (conv_id, turn_idx). Row size is
estimated from the payload columns' UTF-8 lengths plus a fixed per-row overhead —
the analogue of the reference's size-estimate accounting. Output is one row per
envelope (manifest-style), not re-materialized envelope bytes: at 10^12 turns the
envelopes go straight to the sink, so the operator's contract is the assignment
(envelope_idx per row) and the per-envelope accounting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .. import ENVELOPE_MAX_BYTES

_ROW_OVERHEAD = 64  # fixed per-element envelope overhead estimate (bytes)

_SIZE_COLS = ["external_id", "name", "type_name", "tags", "text"]


def _row_sizes(df: pd.DataFrame) -> np.ndarray:
    size = np.full(len(df), _ROW_OVERHEAD, dtype=np.int64)
    for c in _SIZE_COLS:
        if c in df.columns:
            size += df[c].fillna("").str.len().to_numpy(dtype=np.int64)
    return size


def _pack_group(max_bytes: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        sizes = _row_sizes(g)
        # Only CREATE payloads coalesce; DELETE/Remove rows pass through as
        # single-element envelopes (grouping invariant, message_builder.go:85-110 /
        # grouping_test.go: removes are never merged).
        solo = (
            (g["action"] != "CREATE").to_numpy()
            if "action" in g.columns
            else np.zeros(len(g), dtype=bool)
        )
        env_idx = np.zeros(len(g), dtype=np.int64)
        cur = -1
        acc = 0
        open_env = False
        for i, s in enumerate(sizes):  # greedy split (tiny: runs per group)
            if solo[i]:
                cur += 1
                env_idx[i] = cur
                open_env = False
                acc = 0
                continue
            if not open_env or (acc + s > max_bytes and acc > 0):
                cur += 1
                acc = 0
                open_env = True
            env_idx[i] = cur
            acc += s
        g = g.assign(_env=env_idx, _size=sizes)
        out = (
            g.groupby("_env", as_index=False)
            .agg(
                data_source=("data_source", "first"),
                shard_id=("shard_id", "first"),
                n_rows=("_env", "size"),
                bytes=("_size", "sum"),
                first_conv=("conv_id", "first"),
                first_turn=("turn_idx", "first"),
            )
            .rename(columns={"_env": "envelope_idx"})
        )
        return out[
            ["data_source", "shard_id", "envelope_idx", "n_rows", "bytes",
             "first_conv", "first_turn"]
        ]

    return fn


def pack_envelopes(
    routed: "ray.data.Dataset", max_bytes: int = ENVELOPE_MAX_BYTES
) -> "ray.data.Dataset":
    """One row per packed envelope, keyed (data_source, shard_id, envelope_idx)."""
    return routed.groupby(["data_source", "shard_id"]).map_groups(
        _pack_group(max_bytes), batch_format="pandas"
    )
