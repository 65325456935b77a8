"""Vectorized FNV-1a hashing.

The reference computes topology shard assignment as ``fnv1a32(externalId) %
ShardCount`` (reference: connector/topologyconnector/internal/message_builder.go:259-263,
ShardCount=4 at message_builder.go:14-19) and dedup keys as a 64-bit content hash over a
canonical encoding (deduplicator.go:217-413, which uses xxhash64; we use FNV-1a64 — the
same spirit: stable, cross-run deterministic — since xxhash is not a public dependency of
this engine).

Both are implemented as *vectorized* numpy kernels over the Arrow string buffers:
rows are processed in length-sorted order so the byte-position loop touches only the
rows still live at each position — total work is sum(len) bytes, not N × max(len) —
with zero per-row Python in `map_batches` stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV32_OFFSET = np.uint64(2166136261)
_FNV32_PRIME = np.uint64(16777619)
_FNV32_MASK = np.uint64(0xFFFFFFFF)
_FNV64_OFFSET = np.uint64(14695981039346656037)
_FNV64_PRIME = np.uint64(1099511628211)


def fnv1a32(s: str | bytes) -> int:
    """Scalar FNV-1a 32-bit (reference semantics: Go's hash/fnv New32a)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    acc = 2166136261
    for b in s:
        acc = ((acc ^ b) * 16777619) & 0xFFFFFFFF
    return acc


def fnv1a64(s: str | bytes) -> int:
    if isinstance(s, str):
        s = s.encode("utf-8")
    acc = 14695981039346656037
    for b in s:
        acc = ((acc ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return acc


def _as_string_array(values) -> "pa.Array":
    """Coerce any string-ish column to an Arrow string array with the same value
    semantics as the legacy byte-matrix path (None → the literal "None", non-str
    → str(v)) so hashes stay bit-identical across the delegation."""
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array) and pa.types.is_string(values.type):
        return pc.fill_null(values, "None") if values.null_count else values
    arr = np.asarray(values, dtype=object)
    try:
        s = pa.array(arr, pa.string())
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        s = pa.array(arr.astype(str), pa.string())
    return pc.fill_null(s, "None") if s.null_count else s


def _fnv_vector(values, offset: np.uint64, prime: np.uint64, mask: np.uint64 | None) -> np.ndarray:
    return _fnv_arrow(_as_string_array(values), offset, prime, mask)


def fnv1a32_array(values) -> np.ndarray:
    """Vectorized FNV-1a32 over a string column; returns uint64 ndarray (< 2^32)."""
    return _fnv_vector(values, _FNV32_OFFSET, _FNV32_PRIME, _FNV32_MASK)


def fnv1a64_array(values) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _fnv_vector(values, _FNV64_OFFSET, _FNV64_PRIME, None)


def shard_id_array(external_ids, shard_count: int = 4) -> np.ndarray:
    """``fnv1a32(external_id) % shard_count`` as int32 (message_builder.go:259-263)."""
    return (fnv1a32_array(external_ids) % np.uint64(shard_count)).astype(np.int32)


def _arrow_string_bytes(arr: "pa.Array") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data uint8, starts, lens) views over an Arrow string array's buffers —
    zero-copy access to the UTF-8 bytes, no per-row materialization."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    return data, starts, lens


def _fnv_arrow(arr: "pa.Array", offset: np.uint64, prime: np.uint64, mask) -> np.ndarray:
    """Byte-position loop over length-SORTED rows: each iteration touches only the
    rows still live (a suffix of the sorted order), so total work is sum(lens)
    instead of n × max(len) — ~10× on skewed lengths, bit-identical outputs."""
    data, starts, lens = _arrow_string_bytes(arr)
    n = len(starts)
    acc = np.full(n, offset, dtype=np.uint64)
    if n == 0:
        return acc
    order = np.argsort(lens, kind="stable")
    s_lens = lens[order]
    s_starts = starts[order]
    s_acc = acc[order]
    width = int(s_lens[-1])
    with np.errstate(over="ignore"):
        for pos in range(width):
            k = int(np.searchsorted(s_lens, pos, side="right"))
            b = data[s_starts[k:] + pos].astype(np.uint64)
            nxt = (s_acc[k:] ^ b) * prime
            if mask is not None:
                nxt &= mask
            s_acc[k:] = nxt
    acc[order] = s_acc
    return acc


def fnv1a32_arrow(arr: "pa.Array") -> np.ndarray:
    """Vectorized FNV-1a32 straight off Arrow string buffers (zero-copy)."""
    return _fnv_arrow(arr, _FNV32_OFFSET, _FNV32_PRIME, _FNV32_MASK)


def fnv1a64_arrow(arr: "pa.Array") -> np.ndarray:
    return _fnv_arrow(arr, _FNV64_OFFSET, _FNV64_PRIME, None)
