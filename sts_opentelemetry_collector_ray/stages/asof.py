"""Distributed as-of join — the classic operator Ray Data lacks natively.

Shape: both sides co-partition by ``hash(key) % num_buckets`` (ONE bounded
exchange each; a key's rows land whole in one bucket), then each bucket
resolves matches with a vectorized merge: concatenate left+right with a side
flag, lexsort by (key, ts, side), and forward-propagate the latest right row
index with ``np.maximum.accumulate`` — O(n log n) per bucket, no per-row
Python. The partitioning assumption (key-aligned buckets) is the same one the
repo's dedup/sessionize stages document; skew in a single key degrades to one
bucket's sort, never a cross-bucket shuffle.

Tie semantics (deterministic): at equal (key, ts) the right row with the
LARGEST tiebreak id wins, and right rows at ts == left ts DO match (``<=``,
the standard as-of inequality). Unmatched left rows drop (inner as-of).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a32_array


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    num_buckets: int = 64,
    out_left: str = "left_id",
    out_right: str = "right_id",
) -> "ray.data.Dataset":
    """(out_left, key, out_right, gap_us): each left row matched to the most
    recent right row of the same key at ts ≤ left ts."""

    def bucketize(side: int):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = pc.cast(t[key_col], pa.string()).combine_chunks()
            b = (
                fnv1a32_array(key.to_numpy(zero_copy_only=False))
                % np.uint64(num_buckets)
            ).astype(np.int32)
            out = t.append_column("_bucket", pa.array(b, pa.int32()))
            return out.append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8), pa.int8())
            )

        return fn

    # identical schemas on both sides (union requires it): (_id, key, ts)
    l = left.select_columns([left_id, key_col, ts_col])
    r = right.select_columns([right_id, key_col, ts_col])
    if left_id != "_id":
        l = l.rename_columns({left_id: "_id"})
    if right_id != "_id":
        r = r.rename_columns({right_id: "_id"})
    l = l.map_batches(bucketize(1), batch_format="pyarrow")
    r = r.map_batches(bucketize(0), batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        side = df["_side"].to_numpy()
        ids = df["_id"].to_numpy(dtype=np.int64)
        key = df[key_col].to_numpy()
        # sort: key, ts, side (right first at equal ts → '<=' matching),
        # id last so the largest right id at equal ts is seen latest
        order = np.lexsort((ids, side, ts, key))
        key_s, ts_s, side_s, ids_s = key[order], ts[order], side[order], ids[order]
        n = len(df)
        ridx = np.where(side_s == 0, np.arange(n), -1)
        # forward-fill the latest right position, resetting at key boundaries
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = key_s[1:] != key_s[:-1]
        seg = np.cumsum(new_key) - 1
        # maximum.accumulate within segments: offset trick keeps resets exact
        offset = seg.astype(np.int64) * (n + 1)
        filled = np.maximum.accumulate(np.where(ridx >= 0, ridx + offset, -1))
        filled = np.where(filled - offset >= 0, filled - offset, -1)
        is_left = side_s == 1
        match = filled[is_left]
        ok = match >= 0
        out = pd.DataFrame(
            {
                out_left: ids_s[is_left][ok],
                key_col: key_s[is_left][ok],
                out_right: ids_s[match[ok]],
                "gap_us": ts_s[is_left][ok] - ts_s[match[ok]],
            }
        )
        return out

    both = l.union(r)
    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")
