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


def interval_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    point_id: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    interval_id: str = "session_idx",
    num_buckets: int = 64,
    out_point: str = "point_id",
    out_interval: str = "interval_id",
) -> "ray.data.Dataset":
    """Range join of points into PER-KEY NON-OVERLAPPING intervals (the
    partitioning assumption — session windows, validity ranges): a point joins
    the interval of the same key with start ≤ ts ≤ end.

    Same scale shape as `asof_join`: key-aligned bucket co-partition, then one
    vectorized lexsort + maximum.accumulate per bucket — the point matches the
    latest interval START at or before it (an as-of match), then the interval's
    END filters it. Interval starts sort before points at equal ts, so a point
    exactly on a boundary joins the interval that starts there. Points outside
    every interval drop (inner join). Overlapping intervals would shadow each
    other (latest start wins) — hence the non-overlap contract.

    Output: (out_point, key, out_interval, offset_us = ts − start).
    """

    def bucketed(ds, side, build):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = pc.cast(t[key_col], pa.string()).combine_chunks()
            b = (
                fnv1a32_array(key.to_numpy(zero_copy_only=False))
                % np.uint64(num_buckets)
            ).astype(np.int32)
            out = build(t)
            out = out.append_column("_bucket", pa.array(b, pa.int32()))
            return out.append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8), pa.int8())
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    def build_points(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()) if pa.types.is_timestamp(t[ts_col].type) else t[ts_col]
        return pa.table(
            {
                key_col: t[key_col],
                "_ts": ts.cast(pa.int64()) if isinstance(ts, pa.ChunkedArray) else ts,
                "_end": pa.array(np.full(t.num_rows, -1, dtype=np.int64), pa.int64()),
                "_id": t[point_id].cast(pa.int64()) if t[point_id].type != pa.int64() else t[point_id],
            }
        )

    def build_intervals(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: t[key_col],
                "_ts": t[start_col].cast(pa.int64()),
                "_end": t[end_col].cast(pa.int64()),
                "_id": t[interval_id].cast(pa.int64()),
            }
        )

    p = bucketed(points, 1, build_points)
    iv = bucketed(intervals, 0, build_intervals)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["_ts"].to_numpy(dtype=np.int64)
        side = df["_side"].to_numpy()
        ids = df["_id"].to_numpy(dtype=np.int64)
        end = df["_end"].to_numpy(dtype=np.int64)
        key = df[key_col].to_numpy()
        order = np.lexsort((ids, side, ts, key))
        key_s, ts_s, side_s, ids_s, end_s = (
            key[order], ts[order], side[order], ids[order], end[order]
        )
        n = len(df)
        iidx = np.where(side_s == 0, np.arange(n), -1)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = key_s[1:] != key_s[:-1]
        seg = np.cumsum(new_key) - 1
        offset = seg.astype(np.int64) * (n + 1)
        filled = np.maximum.accumulate(np.where(iidx >= 0, iidx + offset, -1))
        filled = np.where(filled - offset >= 0, filled - offset, -1)
        is_pt = side_s == 1
        match = filled[is_pt]
        ok = (match >= 0) & (ts_s[is_pt] <= np.where(match >= 0, end_s[match], -1))
        return pd.DataFrame(
            {
                out_point: ids_s[is_pt][ok],
                key_col: key_s[is_pt][ok],
                out_interval: ids_s[match[ok]],
                "offset_us": ts_s[is_pt][ok] - ts_s[match[ok]],
            }
        )

    return p.union(iv).groupby("_bucket").map_groups(merge, batch_format="pandas")
