"""Line-level (window-level) dedup — the C4 / RefinedWeb text-cleaning step.

Web-pipeline recipes drop repeated lines/paragraphs, both *within* a document
(C4: "discard all but one of any three-sentence span occurring more than once";
Raffel et al. 2020 §2.2) and *across* the corpus (RefinedWeb / Lee et al. 2021
"Deduplicating Training Data Makes Language Models Better": keep the first
occurrence of each duplicated span corpus-wide). This corpus's documents are
space-separated word streams with no newline structure, so the "line" unit is a
deterministic fixed-width window of ``window`` words (chunk k = words
[k*window, (k+1)*window)) — the same shape, with an exactly SQL-replayable
boundary rule.

Scale design:

- ``line_dedup_docs`` (within-doc) is a pure ``map_batches`` kernel — zero
  shuffles; each batch splits, chunks, first-wins-filters and re-joins with
  Arrow/numpy kernels only (one ``split_pattern``, one ``binary_join``, one
  vectorized pandas ``duplicated`` over (row, chunk)).
- ``line_dedup_global`` ships each chunk occurrence through ONE bounded
  exchange keyed on ``hash(chunk) % num_buckets`` (all occurrences of a chunk
  co-locate; a chunk is ~``window`` words ≈ bytes comparable to a MinHash
  signature), keeps the global first occurrence per distinct chunk string
  (exact string compare inside the bucket — no hash-collision exposure), then
  reassembles the surviving windows per document through a second bounded
  exchange on ``hash(doc_id) % num_buckets``. Documents whose every window
  lost disappear (their content exists verbatim earlier in the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import fnv1a32_arrow


def _chunk_words(text_col, window: int):
    """Split a string column into ``window``-word chunks — all Arrow kernels.

    Returns ``(chunks, chunk_row, chunk_widx)``: chunk strings, owning row index
    and within-row window index, in (row, widx) order."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    words = pc.split_pattern(pc.fill_null(text_col, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    n = len(text_col)
    m = len(flat)
    if m == 0:
        empty = pa.array([], pa.string())
        return empty, np.zeros(0, np.int64), np.zeros(0, np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    row_id = np.repeat(np.arange(n, dtype=np.int64), counts)
    ord_ = np.arange(m, dtype=np.int64) - np.repeat(offs[:-1], counts)
    widx = ord_ // window
    change = np.empty(m, dtype=bool)
    change[0] = True
    change[1:] = (row_id[1:] != row_id[:-1]) | (widx[1:] != widx[:-1])
    starts = np.flatnonzero(change)
    chunk_off = np.append(starts, m).astype(np.int32)
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(chunk_off, pa.int32()), flat), " "
    )
    return chunks, row_id[starts], widx[starts]


def line_dedup_batch(t: pa.Table, window: int = 2) -> pa.Table:
    """Within-document first-wins window dedup over one batch (no state, no
    shuffle). Keeps each distinct chunk's first (lowest-widx) occurrence per doc
    and re-joins the survivors in original order."""
    chunks, crow, _ = _chunk_words(t["text"], window)
    n = t.num_rows
    # exact first-occurrence per (row, chunk string): pandas duplicated is a
    # C hashtable over the actual values — vectorized AND collision-free
    dup = pd.DataFrame(
        {"r": crow, "c": chunks.to_numpy(zero_copy_only=False)}
    ).duplicated().to_numpy()
    keep = ~dup
    n_windows = np.bincount(crow, minlength=n).astype(np.int64)
    kept_counts = np.bincount(crow[keep], minlength=n).astype(np.int64)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=out_off[1:])
    text_out = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(out_off.astype(np.int32), pa.int32()), chunks.filter(pa.array(keep))
        ),
        " ",
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "text": text_out,
            "n_windows": pa.array(n_windows, pa.int64()),
            "n_kept": pa.array(kept_counts, pa.int64()),
        }
    )


def line_dedup_docs(
    ds: "ray.data.Dataset", window: int = 2
) -> "ray.data.Dataset":
    """Within-document window dedup — embarrassingly parallel, streams at any scale."""
    return ds.map_batches(
        lambda t: line_dedup_batch(t, window), batch_format="pyarrow"
    )


def _bucket_winners(num_buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("chunk", "ascending"),
                ("doc_id", "ascending"),
                ("widx", "ascending"),
            ],
        )
        t = t.take(order)
        c = t["chunk"].to_numpy(zero_copy_only=False)
        first = np.empty(len(c), dtype=bool)
        if len(c):
            first[0] = True
            first[1:] = c[1:] != c[:-1]
        t = t.filter(pa.array(first)).drop_columns(["_bucket"])
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b2 = ((doc * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(
            num_buckets
        )
        return t.append_column("_bucket2", pa.array(b2.astype(np.int32), pa.int32()))

    return fn


def _assemble_docs(t: pa.Table) -> pa.Table:
    order = pc.sort_indices(
        t, sort_keys=[("doc_id", "ascending"), ("widx", "ascending")]
    )
    t = t.take(order)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    m = len(doc)
    if m == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
            }
        )
    change = np.empty(m, dtype=bool)
    change[0] = True
    change[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(change)
    off = np.append(starts, m).astype(np.int32)
    chunk_col = t["chunk"]
    if isinstance(chunk_col, pa.ChunkedArray):
        chunk_col = chunk_col.combine_chunks()
    text_out = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(off, pa.int32()), chunk_col), " "
    )
    n_kept = np.diff(np.append(starts, m)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc[starts], pa.int64()),
            "text": text_out,
            "n_kept": pa.array(n_kept, pa.int64()),
        }
    )


def line_dedup_global(
    ds: "ray.data.Dataset", window: int = 2, num_buckets: int = 64
) -> "ray.data.Dataset":
    """Corpus-global first-wins window dedup (Lee et al. 2021 shape).

    Winner for each distinct chunk string = the minimum (doc_id, widx)
    occurrence corpus-wide. Two bounded exchanges: chunk-hash buckets to elect
    winners (exact string compare within the bucket), doc-hash buckets to
    reassemble surviving windows in order. The driver never sees a row."""

    def explode(t: pa.Table) -> pa.Table:
        chunks, crow, cwidx = _chunk_words(t["text"], window)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        b = (fnv1a32_arrow(chunks) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(doc[crow], pa.int64()),
                "widx": pa.array(cwidx, pa.int64()),
                "chunk": chunks,
                "_bucket": pa.array(b, pa.int32()),
            }
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")
    winners = ex.groupby("_bucket").map_groups(
        _bucket_winners(num_buckets), batch_format="pyarrow"
    )
    return winners.groupby("_bucket2").map_groups(
        lambda t: _assemble_docs(t.drop_columns(["_bucket2"])),
        batch_format="pyarrow",
    )
