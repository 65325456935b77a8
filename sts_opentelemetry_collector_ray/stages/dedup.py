"""Dedup stage — first-wins suppression by projection hash.

The reference's deduplicator is a TTL'd LRU keyed by a canonical hash of only the
fields each mapping references; a row is published if its key is new or older than
TTL×refreshFraction (reference: connector/topologyconnector/internal/deduplicator.go:
52-205). In a batch run the TTL window degenerates to once-per-run first-wins — an
anti-join of each row against the set of earlier rows with the same key, under the
deterministic order (conv_id, turn_idx, data_source).

Scale design (`finalize_routed`, below): ONE shuffle, no per-key Python, single
linear lineage — a per-batch combiner followed by a bucket exchange that performs
dedup AND per-conversation ordering together. Rows with a null key (DELETE
actions, error rows) bypass the gate — the reference only dedups CREATE payloads
(mapping_handler.go:196-203) — and ride the same shuffle rather than a second
dataset branch: branching a lazy Dataset would re-execute the whole upstream per
branch and double every actor pool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ---------------------------------------------------------------------------
# Single-shuffle finalize: dedup + per-conversation ordering in ONE exchange.
# ---------------------------------------------------------------------------

_SORT = ["sink", "conv_id", "turn_idx", "data_source"]
# NOTE: pc.sort_indices on multiple keys is a stable C++ radix/merge sort over
# Arrow string/int columns — an order of magnitude faster than pandas
# object-dtype sort_values on the same data.


def _sorted_first_wins(t: "pa.Table") -> "pa.Table":
    """Arrow-native: stable sort by (sink, conv, turn, data_source) then keep the
    first row per non-null dedup_key. All C++ kernels + one vectorized pandas
    `duplicated` over the exact uint64 key — no pandas frame conversion, no lossy
    float cast (nullable uint64 is a first-class Arrow type)."""
    order = pc.sort_indices(
        t, sort_keys=[(k, "ascending") for k in _SORT]
    )
    t = t.take(order)
    col = t["dedup_key"].combine_chunks() if isinstance(t["dedup_key"], pa.ChunkedArray) else t["dedup_key"]
    keyed = ~np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False))
    keep = np.ones(len(t), dtype=bool)
    if keyed.any():
        dk = np.asarray(
            pc.fill_null(col, 0).to_numpy(zero_copy_only=False), dtype=np.uint64
        )
        keep[keyed] = ~pd.Series(dk[keyed]).duplicated(keep="first").to_numpy()
    return t.filter(pa.array(keep))


def _finalize_local(
    num_buckets: int,
    nonlocal_sources: frozenset,
    saltable_sources: frozenset = frozenset(),
    salt_span: int | None = None,
):
    """Per-batch: local first-wins combiner + bucket assignment.

    Bucket choice is the key insight: a dedup key whose rule references ``conv_id``
    can only collide within one conversation, so bucketing those rows by
    ``hash(conv_id) % B`` co-locates all their duplicates AND all rows needed for
    per-conversation ordering — dedup and sort share one shuffle. Only rules whose
    expressions never touch ``conv_id`` (cross-conversation keys) bucket by
    ``dedup_key % B`` instead; their ordering is still per-bucket sorted.

    Hot-key salting (opt-in, ``salt_span``): a pathological conversation (an agent
    loop with 10⁶+ turns) would land entirely in one bucket task. Rows whose rule
    references BOTH conv_id and turn_idx have row-unique dedup keys (duplicates
    can only be exact (conv, turn) repeats, which share a salt chunk), so those
    rows may be salted into ``hash(conv ⊕ turn_idx // span)`` buckets without
    breaking dedup; rows from conv-local-but-not-turn-local rules (e.g. the
    relation rule) must stay whole and keep the plain conv bucket. Ordering
    weakens from per-conversation to per-salt-chunk — the explicit trade the
    reference makes implicitly when a key's Kafka partition saturates."""
    from ..functions.hashing import fnv1a32_arrow

    def fn(t: pa.Table) -> pa.Table:
        t = _sorted_first_wins(t)
        conv_hash = fnv1a32_arrow(t["conv_id"].combine_chunks())
        conv_bucket = (conv_hash % np.uint64(num_buckets)).astype(np.int32)
        bucket = conv_bucket
        ds_col = None
        if salt_span and saltable_sources:
            ds_col = t["data_source"].to_numpy(zero_copy_only=False)
            saltable = np.isin(ds_col, list(saltable_sources))
            if saltable.any():
                chunk = (
                    t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    // np.uint64(salt_span)
                )
                salted = ((conv_hash ^ (chunk * np.uint64(0x9E3779B1))) % np.uint64(num_buckets)).astype(np.int32)
                bucket = np.where(saltable, salted, conv_bucket)
        if nonlocal_sources:
            if ds_col is None:
                ds_col = t["data_source"].to_numpy(zero_copy_only=False)
            col = t["dedup_key"].combine_chunks()
            nonnull = ~np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False))
            is_nl = np.isin(ds_col, list(nonlocal_sources)) & nonnull
            bucket = np.asarray(bucket).copy()
            if is_nl.any():
                dk = np.asarray(
                    pc.fill_null(col, 0).to_numpy(zero_copy_only=False),
                    dtype=np.uint64,
                )
                bucket[is_nl] = (
                    dk[is_nl] % np.uint64(num_buckets)
                ).astype(np.int32) + np.int32(num_buckets)
        # Slim the exchange: per-rule-constant envelope columns (~12% of payload
        # bytes) stay home; the bucket side restores them from data_source.
        t = t.drop_columns([c for c in _ENVELOPE_COLS if c in t.column_names])
        return t.append_column("_bucket", pa.array(np.asarray(bucket, dtype=np.int32), pa.int32()))

    return fn


# Per-rule constants that ride the exchange as full columns otherwise: sink
# (5.7% of payload bytes, measured at sf0.01), expire_after_ms (3.0%),
# specificity (3.1%) are all FUNCTIONS of data_source — drop them before the
# shuffle, restore from a tiny broadcast map after. Safe for first-wins: a
# dedup key's prefix is (identifier|signal), so duplicates of one key always
# share one data_source (hence one sink) — the combiner's winner is identical
# with or without sink in its sort key.
_ENVELOPE_COLS = ["sink", "expire_after_ms", "specificity"]


def _envelope_map(rules) -> dict[str, tuple[str, int, float | None]]:
    return {
        r.rule.identifier: (
            r.rule.sink,
            int(r.rule.expire_after_ms),
            None if r.is_relation else float(r.rule.specificity),
        )
        for r in rules
    }


def _finalize_bucket_restoring(env_map: dict, schema: "pa.Schema"):
    """Per-bucket: restore the per-rule envelope columns from data_source, then
    deterministic order + exact first-wins on co-located keys."""
    keys = pa.array(list(env_map.keys()), pa.string())
    sinks = pa.array([v[0] for v in env_map.values()], pa.string())
    expires = pa.array([v[1] for v in env_map.values()], pa.int64())
    specs = pa.array([v[2] for v in env_map.values()], pa.float64())

    def fn(t: "pa.Table") -> "pa.Table":
        idx = pc.index_in(t["data_source"], value_set=keys)
        cols = {name: t[name] for name in t.column_names}
        cols["sink"] = pc.take(sinks, idx)
        cols["expire_after_ms"] = pc.take(expires, idx)
        cols["specificity"] = pc.take(specs, idx)
        t = pa.table({f.name: cols[f.name] for f in schema})
        return _sorted_first_wins(t)

    return fn


def finalize_routed(
    ds: "ray.data.Dataset",
    rules=None,
    num_buckets: int = 64,
    salt_span: int | None = None,
) -> "ray.data.Dataset":
    """Dedup + per-conversation ordering with a single full-payload shuffle.

    Replaces [hash-bucket dedup shuffle] + [global range sort] with one
    ``groupby(_bucket).map_groups``: each bucket holds whole conversations (plus any
    cross-conversation key groups), is sorted by (sink, conv_id, turn_idx,
    data_source) and first-wins-deduped vectorized. Output files therefore carry
    monotone (sink, conv, turn) runs per bucket — the per-partition ordering
    guarantee of the reference's Kafka keying (message_builder.go:196-203).

    Skew: buckets are hash-uniform over conversations. For corpora with
    pathological hot conversations (≫ a worker heap), pass ``salt_span`` (e.g.
    100_000): rows from turn-unique rules are salted into per-turn-range buckets
    — see `_finalize_local` for why this provably preserves dedup exactness —
    while non-turn-local rules keep whole-conversation buckets. Counts are
    unaffected either way (the aggregate branch pre-combines per batch)."""
    from ..rules.model import default_ruleset

    rules = rules if rules is not None else default_ruleset()
    # r.action is None for computed-action rules (they MAY emit CREATE rows).
    nonlocal_sources = frozenset(
        r.rule.identifier
        for r in rules
        if r.action in (None, "CREATE") and "conv_id" not in r.referenced_columns
    )
    # Saltable = rows guaranteed free of cross-salt-chunk duplicates, for two
    # DIFFERENT reasons that must both stay true:
    #  (a) CREATE rules referencing both conv_id and turn_idx → dedup key is
    #      row-unique (duplicates only as exact (conv, turn) repeats, which land
    #      in the same salt chunk);
    #  (b) never-CREATE rules (constant DELETE/CONTINUE) → route.py emits NULL
    #      dedup_key for every DELETE/error row, so they are never dedup-gated.
    #      Computed-action rules (r.action is None) may emit CREATE, so they only
    #      qualify through arm (a). If tombstones ever gain a dedup key (e.g. for
    #      anti-join matching), drop this arm.
    saltable_sources = frozenset(
        r.rule.identifier
        for r in rules
        if {"conv_id", "turn_idx"} <= r.referenced_columns
        or (r.action is not None and r.action != "CREATE")
    )
    pre = ds.map_batches(
        _finalize_local(num_buckets, nonlocal_sources, saltable_sources, salt_span),
        batch_format="pyarrow",
    )
    from .route import ROUTED_SCHEMA

    return pre.groupby("_bucket").map_groups(
        _finalize_bucket_restoring(_envelope_map(rules), ROUTED_SCHEMA),
        batch_format="pyarrow",
    )
