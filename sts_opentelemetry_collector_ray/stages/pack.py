"""Envelope packing — byte-capped message coalescing (A5).

The reference merges single-element topology messages sharing (owner, dataSource,
shardId, collectionTs) into ≤768 KiB envelopes in first-seen order, using running
size estimates instead of re-serializing per merge (reference:
connector/topologyconnector/internal/message_builder.go:162-257; the 768 KiB cap
derives from Kafka's 1 MiB record limit, message_builder.go:162-171).

Ray translation, scale-shaped: a (data_source, shard_id) group is corpus-sized at
100 TB, so packing runs per BOUNDED SUB-BUCKET — a contiguous conv_id range of
``CONVS_PER_BUCKET`` conversations — and envelope indices are made global per
(data_source, shard_id) afterwards with a prefix-sum offset over the per-bucket
envelope counts (tiny: one count per bucket). Envelopes never span a bucket
boundary; the reference itself packs per consume-batch (message_builder.go:
builder flushed per ConsumeTopology call), so a deterministic range boundary is
faithful. Inside a bucket the greedy scan is vectorized: one cumsum +
searchsorted per EMITTED ENVELOPE (O(#envelopes log n), not O(rows) Python).

Row size is estimated from the payload columns' UTF-8 lengths plus a fixed
per-row overhead — the analogue of the reference's size-estimate accounting.
Output is one row per envelope (manifest-style), not re-materialized envelope
bytes: at 10^12 turns the envelopes go straight to the sink, so the operator's
contract is the assignment and the per-envelope accounting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .. import ENVELOPE_MAX_BYTES

_ROW_OVERHEAD = 64  # fixed per-element envelope overhead estimate (bytes)

_SIZE_COLS = ["external_id", "name", "type_name", "tags", "text"]

# Conversations per packing sub-bucket. Bounds a map_groups group to
# ~CONVS_PER_BUCKET × turns-per-conv rows regardless of corpus size; raise it
# to amortize more coalescing per envelope sequence, lower it for heap room.
CONVS_PER_BUCKET = 512


def _row_sizes(df: pd.DataFrame) -> np.ndarray:
    size = np.full(len(df), _ROW_OVERHEAD, dtype=np.int64)
    for c in _SIZE_COLS:
        if c in df.columns:
            size += df[c].fillna("").str.len().to_numpy(dtype=np.int64)
    return size


def _pack_run(sizes: np.ndarray, cap: int, env: np.ndarray, start_env: int) -> int:
    """Greedy first-fit split of one all-CREATE run: each envelope is the longest
    prefix whose size sum stays ≤ cap (an oversized single row still ships —
    matching message_builder.go's estimate-then-send). One searchsorted on the
    run's cumsum per emitted envelope. Writes env indices in place; returns the
    next free envelope index."""
    n = len(sizes)
    c = np.cumsum(sizes)
    a, e = 0, start_env
    while a < n:
        base = c[a - 1] if a else 0
        b = int(np.searchsorted(c, base + cap, side="right"))
        if b <= a:  # single row over cap → its own envelope
            b = a + 1
        env[a:b] = e
        e += 1
        a = b
    return e


def _pack_group(max_bytes: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if "_bucket" not in g.columns:  # direct (non-bucketed) use in tests
            g = g.assign(_bucket=np.int64(0))
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
        cur = 0
        # segment the first-seen order at solo rows; pack each CREATE run with
        # the searchsorted kernel, solos take one envelope each
        bounds = np.flatnonzero(solo)
        prev = 0
        for s in bounds:
            if s > prev:
                cur = _pack_run(sizes[prev:s], max_bytes, env_idx[prev:s], cur)
            env_idx[s] = cur
            cur += 1
            prev = s + 1
        if prev < len(g):
            cur = _pack_run(sizes[prev:], max_bytes, env_idx[prev:], cur)
        g = g.assign(_env=env_idx, _size=sizes)
        out = (
            g.groupby("_env", as_index=False)
            .agg(
                data_source=("data_source", "first"),
                shard_id=("shard_id", "first"),
                bucket=("_bucket", "first"),
                n_rows=("_env", "size"),
                bytes=("_size", "sum"),
                first_conv=("conv_id", "first"),
                first_turn=("turn_idx", "first"),
            )
            .rename(columns={"_env": "envelope_idx"})
        )
        return out[
            ["data_source", "shard_id", "bucket", "envelope_idx", "n_rows",
             "bytes", "first_conv", "first_turn"]
        ]

    return fn


def _add_bucket(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # conv_id is 'conv-%08d' — its digits give the contiguous range key
    digits = pc.replace_substring_regex(t["conv_id"], r"\D+", "")
    conv = pc.cast(
        pc.if_else(pc.equal(digits, ""), pa.scalar("0"), digits), pa.int64()
    )
    return t.append_column(
        "_bucket", pc.divide(conv, pa.scalar(CONVS_PER_BUCKET, pa.int64()))
    )


def pack_envelopes(
    routed: "ray.data.Dataset", max_bytes: int = ENVELOPE_MAX_BYTES
) -> "ray.data.Dataset":
    """One row per packed envelope, keyed (data_source, shard_id, envelope_idx).

    envelope_idx is globally dense per (data_source, shard_id): local per-bucket
    indices plus a prefix-sum offset over bucket envelope counts. The offset
    table is one int per non-empty bucket — |convs| / CONVS_PER_BUCKET entries —
    which is driver-held and broadcast (`ray.put`); at 10^12 turns / 10^9 convs
    that is ~2M entries, still megabytes."""
    local = (
        routed.map_batches(_add_bucket, batch_format="pyarrow")
        .groupby(["data_source", "shard_id", "_bucket"])
        .map_groups(_pack_group(max_bytes), batch_format="pandas")
    )
    # Per-bucket envelope counts → per-bucket global offsets. One tiny row per
    # bucket leaves the cluster; the envelope rows themselves never do.
    counts = (
        local.groupby(["data_source", "shard_id", "bucket"]).count().to_pandas()
    )
    counts = counts.sort_values(["data_source", "shard_id", "bucket"])
    counts["off"] = counts.groupby(["data_source", "shard_id"])[
        "count()"
    ].cumsum() - counts["count()"]
    offsets = {
        (ds, sh, int(b)): int(o)
        for ds, sh, b, o in zip(
            counts["data_source"], counts["shard_id"], counts["bucket"],
            counts["off"],
        )
    }
    off_ref = ray.put(offsets)

    def renumber(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        key = list(
            zip(df["data_source"], df["shard_id"], df["bucket"].astype(int))
        )
        df = df.assign(
            envelope_idx=df["envelope_idx"].to_numpy()
            + np.fromiter((off[k] for k in key), dtype=np.int64, count=len(df))
        )
        return df.drop(columns=["bucket"])

    return local.map_batches(renumber, batch_format="pandas")


# Documents per sequence-packing sub-bucket (same bounding idea as
# CONVS_PER_BUCKET: a map_groups group is ≤ DOCS_PER_BUCKET rows regardless of
# corpus size; bins never span a bucket boundary).
DOCS_PER_BUCKET = 1024


def pack_documents(
    ds: "ray.data.Dataset",
    max_tokens: int = 512,
    docs_per_bucket: int = DOCS_PER_BUCKET,
) -> "ray.data.Dataset":
    """Sequence packing for training: documents → token-budget bins.

    The LLM-training analogue of envelope packing (A5): greedy first-fit in
    deterministic doc_id order, each bin the longest prefix whose whitespace
    token count stays ≤ ``max_tokens`` (an oversized single doc still ships as
    its own bin). Packing runs per bounded doc_id-range bucket with the same
    searchsorted kernel; bin indices are made globally dense with a prefix-sum
    over per-bucket bin counts (one int per bucket leaves the cluster).

    Output is the bin manifest — (bin_idx, n_docs, n_tokens, first_doc) — the
    assignment a writer needs to emit packed sequences, not re-materialized
    text (at corpus scale the text goes straight from the scan to the sink).
    """
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        did = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_id": did,
                "n_tokens": n,
                "_bucket": pc.divide(did, pa.scalar(docs_per_bucket, pa.int64())),
            }
        )

    def packg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        sizes = g["n_tokens"].to_numpy(dtype=np.int64)
        env = np.zeros(len(g), dtype=np.int64)
        _pack_run(sizes, max_tokens, env, 0)
        g = g.assign(_bin=env)
        out = g.groupby("_bin", as_index=False).agg(
            bucket=("_bucket", "first"),
            n_docs=("_bin", "size"),
            n_tokens=("n_tokens", "sum"),
            first_doc=("doc_id", "first"),
        )
        return out.rename(columns={"_bin": "bin_idx"})[
            ["bucket", "bin_idx", "n_docs", "n_tokens", "first_doc"]
        ]

    local = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(packg, batch_format="pandas")
    )
    counts = local.groupby("bucket").count().to_pandas()
    counts = counts.sort_values("bucket")
    counts["off"] = counts["count()"].cumsum() - counts["count()"]
    offsets = dict(zip(counts["bucket"].astype(int), counts["off"].astype(int)))
    off_ref = ray.put(offsets)

    def renumber(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.assign(
            bin_idx=df["bin_idx"].to_numpy()
            + np.fromiter(
                (off[int(b)] for b in df["bucket"]), dtype=np.int64, count=len(df)
            )
        )
        return df.drop(columns=["bucket"])

    return local.map_batches(renumber, batch_format="pandas")


def chunk_token_stream(
    ds: "ray.data.Dataset",
    seq_len: int = 256,
    docs_per_bucket: int = DOCS_PER_BUCKET,
) -> "ray.data.Dataset":
    """GPT-style concat-and-chunk sequence packing: the corpus token stream in
    doc_id order is cut into fixed ``seq_len``-token training sequences that
    CROSS document boundaries (the pretraining data layout; contrast
    ``pack_documents``, which is first-fit bin packing that never splits a
    document). Output is one row per document — its global token offset and
    the range of sequence indices its tokens land in: (doc_id, n_tokens,
    tok_start, seq_start, seq_end, n_seqs). That is the assignment a sequence
    writer needs; the text itself streams straight from scan to sink.

    Scale shape: two streaming passes over the scan, no full materialization.
    Pass 1 aggregates ONE token total per ``docs_per_bucket``-sized doc_id
    range (|corpus|/1024 tiny rows reach the driver), which the driver
    exclusive-scans into per-bucket global token offsets and broadcasts
    (``ray.put``). Pass 2 re-derives per-doc counts and positions each doc
    with one vectorized cumsum per BOUNDED bucket group; the only exchange is
    the bucket groupby. Re-tokenizing in both passes is deliberate — carrying
    per-doc counts between passes would mean materializing |corpus| rows.
    """
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        did = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_id": did,
                "n_tokens": n,
                "_bucket": pc.divide(did, pa.scalar(docs_per_bucket, pa.int64())),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_bucket")
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .to_pandas()
    )
    totals = totals.sort_values("_bucket")
    tot = totals["tot"].to_numpy(dtype=np.int64)
    starts = np.cumsum(tot) - tot
    offsets = dict(zip(totals["_bucket"].astype(int), starts.astype(int)))
    off_ref = ray.put(offsets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = off[int(g["_bucket"].iloc[0])] + (np.cumsum(n) - n)
        # n >= 1 always (split of '' is ['']), so `last` is the final token's
        # global position and the doc's sequence range is [start//L, last//L]
        last = start + np.maximum(n, 1) - 1
        seq_start = start // seq_len
        seq_end = last // seq_len
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n,
                "tok_start": start,
                "seq_start": seq_start,
                "seq_end": seq_end,
                "n_seqs": seq_end - seq_start + 1,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def chunk_overlap(
    ds: "ray.data.Dataset", window: int = 64, stride: int = 48
) -> "ray.data.Dataset":
    """RAG-style overlapping chunking: each document's word stream is cut into
    ``window``-word chunks every ``stride`` words (the last chunk may be
    shorter; a document shorter than ``window`` yields exactly one chunk).
    Output one row per chunk: (doc_id, chunk_idx, n_words, chunk_text) — the
    retrieval-index layout a RAG ingestion pipeline writes.

    Pure ``map_batches`` kernel, zero shuffles, zero per-row Python: split →
    flatten once, then every chunk's words are gathered with ONE vectorized
    ``take`` (the repeat+arange index trick) and re-joined with ONE Arrow
    ``binary_join``. Overlapping ranges can't be expressed as ListArray
    offsets over the shared buffer (offsets must partition), hence the gather.
    """
    import pyarrow.compute as pc

    def inner(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(pc.fill_null(text, ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words)
        doc_off = np.concatenate(([0], np.cumsum(n)))
        # chunks per doc: 1 + ceil(max(0, n - window) / stride)
        extra = np.maximum(n - window, 0)
        n_chunks = 1 + (extra + stride - 1) // stride
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        first = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        chunk_idx = np.arange(total, dtype=np.int64) - first[doc_of]
        w_start = chunk_idx * stride
        w_end = np.minimum(w_start + window, n[doc_of])
        lens = w_end - w_start
        g_start = doc_off[doc_of] + w_start
        # gather indices: for chunk c, g_start[c] .. g_start[c]+lens[c]-1
        m = int(lens.sum())
        cum = np.concatenate(([0], np.cumsum(lens)))[:-1]
        idx = np.repeat(g_start - cum, lens) + np.arange(m, dtype=np.int64)
        taken = flat.take(pa.array(idx))
        offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        chunk_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), taken), " "
        )
        doc_ids = pc.cast(t["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_of]),
                "chunk_idx": pa.array(chunk_idx),
                "n_words": pa.array(lens),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(inner, batch_format="pyarrow")
