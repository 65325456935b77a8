"""Zero-copy ingestion of embedding columns (`list<float>` / `fixed_size_list`).

The hot path for every similarity / embedding operator is turning an Arrow list
column into an (n, d) float matrix. Doing that with ``to_pylist()`` + a per-row
``np.asarray`` materializes every vector through Python objects — O(n·d) invoke
overhead. This module does it with ONE flatten + reshape off the Arrow buffers
(zero-copy for the float values; the only copy is the optional dtype widening).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stack_list_column(col, dtype=np.float64) -> np.ndarray:
    """Stack a uniform-length list column into an (n, d) ndarray.

    - `fixed_size_list<T, d>`: values buffer reshaped directly.
    - `list<T>` / `large_list<T>` with uniform lengths: one `flatten()` (which
      honors slice offsets) + reshape.
    - Ragged lengths (not an embedding column): ValueError — no caller can use
      a non-rectangular batch, so fail loudly instead of mis-stacking.

    float32 → float64 widening is exact (same values `to_pylist` produced), so
    downstream SQL oracles stay bit-identical.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        # pandas object column / list-of-lists: ONE C-level pa.array build,
        # then the same flatten+reshape path (micro A/B at 4096×128 float64:
        # per-row np.stack loop 3.8 ms → 1.4 ms here for ndarray elements
        # (2.6×), 20 ms → 11 ms for Python-list elements (1.9×))
        return stack_list_column(pa.array(list(col)), dtype)
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, d).astype(dtype, copy=False)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        import pyarrow.compute as pc

        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        if (lens == lens[0]).all():
            d = int(lens[0])
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, d).astype(dtype, copy=False)
        raise ValueError(
            f"ragged list column (lengths {lens.min()}..{lens.max()}) cannot "
            "stack to a matrix"
        )
    # unexpected layout (e.g. already-decoded object column) — per-row fallback
    return np.stack([np.asarray(v, dtype=dtype) for v in col.to_pylist()])


def topk_partials(
    sims: np.ndarray,
    ids: np.ndarray,
    qids: np.ndarray,
    take: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized local-top-`take` emit for a (n_vectors, n_queries) similarity
    matrix: returns flat (query_id, neighbor_id, score) arrays with `take` rows
    per query — replaces the per-candidate Python append loop. Row order within
    a query is argpartition order (unordered); the driver-side merge sorts."""
    n, q = sims.shape
    take = min(take, n)
    if take <= 0 or q == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.float64)
    if take < n:
        part = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, q)
    else:
        part = np.broadcast_to(np.arange(n)[:, None], (n, q))
    query_id = np.broadcast_to(np.asarray(qids), (take, q)).ravel()
    neighbor_id = np.asarray(ids)[part].ravel()
    score = sims[part, np.broadcast_to(np.arange(q), (take, q))].ravel()
    return (
        query_id.astype(np.int64, copy=False),
        neighbor_id.astype(np.int64, copy=False),
        score.astype(np.float64, copy=False),
    )
