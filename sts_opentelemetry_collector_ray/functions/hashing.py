"""Vectorized FNV-1a hashing.

The reference computes topology shard assignment as ``fnv1a32(externalId) %
ShardCount`` (reference: connector/topologyconnector/internal/message_builder.go:259-263,
ShardCount=4 at message_builder.go:14-19) and dedup keys as a 64-bit content hash over a
canonical encoding (deduplicator.go:217-413, which uses xxhash64; we use FNV-1a64 — the
same spirit: stable, cross-run deterministic — since xxhash is not a public dependency of
this engine).

Both are implemented as *vectorized* numpy kernels: strings are packed into a fixed-width
byte matrix and the hash state advances one character-position at a time across the whole
column (W iterations of O(N) vector ops instead of N Python loops). This keeps the hot
path free of per-row Python in `map_batches` stages.
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


def _to_byte_matrix(values: "pa.Array | np.ndarray | list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Pack a string column into (N, W) uint8 matrix + per-row byte lengths.

    Zero bytes past each row's length are skipped by masking, so NUL-free strings of
    any length hash identically to the scalar loop.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    # Fixed-width bytes dtype: numpy encodes str -> UTF-8 padded with NULs.
    fixed = np.char.encode(arr.astype(str), "utf-8")
    lengths = np.char.str_len(fixed).astype(np.int64)
    width = int(fixed.dtype.itemsize)
    if width == 0:
        return np.zeros((len(arr), 0), dtype=np.uint8), lengths
    mat = np.frombuffer(fixed.tobytes(), dtype=np.uint8).reshape(len(arr), width)
    return mat, lengths


def _fnv_vector(values, offset: np.uint64, prime: np.uint64, mask: np.uint64 | None) -> np.ndarray:
    mat, lengths = _to_byte_matrix(values)
    n, width = mat.shape
    acc = np.full(n, offset, dtype=np.uint64)
    for pos in range(width):
        col = mat[:, pos].astype(np.uint64)
        live = pos < lengths
        nxt = (acc ^ col) * prime
        if mask is not None:
            nxt &= mask
        acc = np.where(live, nxt, acc)
    return acc


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
    data, starts, lens = _arrow_string_bytes(arr)
    n = len(starts)
    acc = np.full(n, offset, dtype=np.uint64)
    if n == 0:
        return acc
    width = int(lens.max()) if n else 0
    guard = max(len(data) - 1, 0)
    with np.errstate(over="ignore"):
        for pos in range(width):
            live = pos < lens
            idx = np.minimum(starts + pos, guard)
            b = data[idx].astype(np.uint64) if len(data) else np.zeros(n, np.uint64)
            nxt = (acc ^ b) * prime
            if mask is not None:
                nxt &= mask
            acc = np.where(live, nxt, acc)
    return acc


def fnv1a32_arrow(arr: "pa.Array") -> np.ndarray:
    """Vectorized FNV-1a32 straight off Arrow string buffers (zero-copy)."""
    return _fnv_arrow(arr, _FNV32_OFFSET, _FNV32_PRIME, _FNV32_MASK)


def fnv1a64_arrow(arr: "pa.Array") -> np.ndarray:
    return _fnv_arrow(arr, _FNV64_OFFSET, _FNV64_PRIME, None)
