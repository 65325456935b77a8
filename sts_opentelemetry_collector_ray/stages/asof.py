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


_SKEW_SENTINEL = -(2 ** 62)


def skew_join(
    probe: "ray.data.Dataset",
    build: "ray.data.Dataset",
    probe_key: str,
    build_key: str,
    build_cols: list[str],
    hot_k: int = 8,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Skew-aware inner join: HOT probe keys join against a BROADCAST slice of
    the build side (no shuffle for the heavy rows), cold keys go through the
    ordinary hash-partitioned ``Dataset.join``. Result rows are identical to a
    plain inner join — hot-key detection only moves work, never changes it.

    Scale shape: hot keys are found with a per-batch top-k count combiner (the
    exchange carries ≤ hot_k·|batches| rows, never the corpus); the hot build
    slice ships once via ``ray.put`` (contract: the build side must be the
    SMALL side — hot_k keys × their build rows must fit a worker heap, the
    broadcast-join precondition). The probe source is consumed twice (hot
    pass, cold pass) — hand it a re-readable source per the no-branch rule;
    each pass re-reads rather than re-executing a shared lazy prefix.

    Without this, one hot key (a bot user, an empty-string join key) lands an
    entire partition on one reducer; salting helps aggregates but not joins —
    broadcast-routing the hot slice is the standard fix.

    Contract: build keys are UNIQUE (a dimension table); the hot pass binds
    each probe row to THE build row via one searchsorted. Keys are int64 and
    must never equal the reserved sentinel ``_SKEW_SENTINEL`` (min-int64
    region; every real id domain is nonnegative)."""
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    # --- detect hot keys: per-batch top-k count partials -> tiny aggregate ---
    def topk_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"k": t[probe_key]})
            .group_by(["k"])
            .aggregate([([], "count_all")])
            .rename_columns(["k", "c"])
        )
        idx = pc.sort_indices(g, sort_keys=[("c", "descending"), ("k", "ascending")])
        return g.take(idx[: hot_k]).replace_schema_metadata(None)

    counts = (
        probe.map_batches(topk_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["c", "k"], ascending=[False, True])
        .head(hot_k)
    )
    hot = set(counts["k"].tolist())

    # --- broadcast the hot slice of the build side ---------------------------
    def build_hot(t: pa.Table) -> pa.Table:
        mask = pa.array(
            np.isin(t[build_key].to_numpy(zero_copy_only=False), list(hot))
        )
        return t.select([build_key, *build_cols]).filter(mask)

    hot_tbl = pa.concat_tables(
        [b for b in build.map_batches(build_hot, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow") if len(b)]
        or [pa.table({build_key: pa.array([], pa.int64()),
                      **{c: pa.array([], pa.string()) for c in build_cols}})]
    )
    hot_ref = ray.put(hot_tbl)

    def hot_pass(t: pa.Table) -> pa.Table:
        ht = ray.get(hot_ref)
        keys = t[probe_key].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(keys, list(hot))))
        pk = t[probe_key].to_numpy(zero_copy_only=False)
        bk = ht[build_key].to_numpy(zero_copy_only=False)
        if len(bk) == 0:
            return pa.table(
                {**{c: t[c].slice(0, 0) for c in t.column_names},
                 **{c: ht[c].slice(0, 0) for c in build_cols}}
            )
        order = np.argsort(bk, kind="stable")
        srt = bk[order]
        loc = np.searchsorted(srt, pk)
        # inner-join semantics: a hot probe key absent from the build side drops
        ok = (loc < len(srt)) & (srt[np.minimum(loc, max(len(srt) - 1, 0))] == pk)
        t = t.filter(pa.array(ok))
        pos = order[loc[ok]]
        out = {c: t[c] for c in t.column_names}
        for c in build_cols:
            out[c] = ht[c].take(pa.array(pos, pa.int64()))
        return pa.table(out)

    def cold_pass(t: pa.Table) -> pa.Table:
        keys = t[probe_key].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(keys, list(hot))))

    def build_cold(t: pa.Table) -> pa.Table:
        mask = ~np.isin(t[build_key].to_numpy(zero_copy_only=False), list(hot))
        return t.select([build_key, *build_cols]).filter(pa.array(mask))

    hot_joined = probe.map_batches(hot_pass, batch_format="pyarrow")

    # A fully-hot probe (or fully-hot build) leaves the cold side EMPTY, and
    # Ray's hash-shuffle join dies on schema-less empty blocks (CLAUDE.md
    # rule). Guarantee both cold sides stay typed-non-empty with ONE reserved
    # sentinel row each (key = _SKEW_SENTINEL, outside the documented
    # nonnegative-key domain); the joined sentinel pair is filtered in norm().
    def sentinel_of(ds_: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
        b = ds_.take_batch(1, batch_format="pyarrow")
        idx = b.column_names.index(key)
        b = b.set_column(
            idx, key, pa.array([_SKEW_SENTINEL] * len(b), b[key].type)
        )
        return ray.data.from_arrow(b.replace_schema_metadata(None))

    cold_joined = (
        probe.map_batches(cold_pass, batch_format="pyarrow")
        .union(sentinel_of(probe, probe_key))
        .join(
            build.map_batches(build_cold, batch_format="pyarrow")
            .union(sentinel_of(build.map_batches(
                lambda t: t.select([build_key, *build_cols]),
                batch_format="pyarrow"), build_key)),
            join_type="inner",
            num_partitions=num_partitions,
            on=(probe_key,),
            right_on=(build_key,),
        )
    )

    probe_cols = [c for c in probe.schema().names]
    out_cols = [*probe_cols, *build_cols]

    def norm(t: pa.Table) -> pa.Table:
        keep = pa.array(
            t[probe_key].to_numpy(zero_copy_only=False) != _SKEW_SENTINEL
        )
        t = t.filter(keep)
        return pa.table({c: t[c] for c in out_cols}).replace_schema_metadata(None)

    return hot_joined.map_batches(norm, batch_format="pyarrow").union(
        cold_joined.map_batches(norm, batch_format="pyarrow")
    )


def bloom_semijoin(
    probe: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    probe_key: str,
    right_key: str,
    n_bits: int = 1 << 16,
    k: int = 4,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Bloom semi-join (the classic distributed-DB bloom-join): keep probe
    rows whose key appears on the right side. The right side's DISTINCT keys
    compress into an ``n_bits`` Bloom filter (per-batch bit-position partials
    → one driver OR over ≤ n_bits/8 bytes, size-independent of the right
    side), the broadcast filter pre-prunes the probe STREAM before any
    shuffle (no false negatives — nothing real is lost), and the survivors
    take an exact hash join against the distinct right keys to kill the
    false positives. Result rows are identical to an exact semi-join; the
    bloom only shrinks the shuffle.

    Keys are int64 (hashed via their decimal string form, matching
    functions/hashing.py conventions); sentinel rows keep empty join sides
    schema-safe (same reserved key contract as ``skew_join``)."""
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .dedup_docs import _bloom_positions
    from ..functions.hashing import fnv1a64_arrow

    def key_str(col: "pa.ChunkedArray") -> "pa.Array":
        s = pc.cast(col, pa.string())
        return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s

    def bits_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(key_str(t[right_key]))
        pos = np.unique(_bloom_positions(fnv1a64_arrow(u), n_bits, k))
        return pa.table({"bit": pa.array(pos.astype(np.int64), pa.int64())})

    bits = keys.map_batches(bits_partial, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(n_bits, dtype=bool)
    if len(bits):
        bloom[np.unique(bits["bit"].to_numpy())] = True
    bloom_ref = ray.put(bloom)

    def prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        pos = _bloom_positions(fnv1a64_arrow(key_str(t[probe_key])), n_bits, k)
        return t.filter(pa.array(b[pos].all(axis=1)))

    def sentinel_of(ds_: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
        b = ds_.take_batch(1, batch_format="pyarrow")
        idx = b.column_names.index(key)
        b = b.set_column(idx, key, pa.array([_SKEW_SENTINEL] * len(b), b[key].type))
        return ray.data.from_arrow(b.replace_schema_metadata(None))

    distinct = keys.groupby(right_key).aggregate(Count(alias_name="_n"))
    out_cols = list(probe.schema().names)

    def norm(t: pa.Table) -> pa.Table:
        keep = pa.array(
            t[probe_key].to_numpy(zero_copy_only=False) != _SKEW_SENTINEL
        )
        t = t.filter(keep)
        return pa.table({c: t[c] for c in out_cols}).replace_schema_metadata(None)

    joined = (
        probe.map_batches(prefilter, batch_format="pyarrow")
        .union(sentinel_of(probe, probe_key))
        .join(
            distinct.map_batches(
                lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
            ).union(
                sentinel_of(
                    keys.map_batches(
                        lambda t: pa.table(
                            {right_key: t[right_key],
                             "_n": pa.array(np.ones(len(t), np.int64))}
                        ),
                        batch_format="pyarrow",
                    ),
                    right_key,
                )
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=(probe_key,),
            right_on=(right_key,),
        )
    )
    return joined.map_batches(norm, batch_format="pyarrow")
