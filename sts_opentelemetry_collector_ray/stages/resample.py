"""Temperature-based corpus resampling — multilingual rebalancing.

The UNIMAX / temperature-sampling recipe used to set language mixture weights in
multilingual pretraining: sampling weight w_l ∝ c_l^alpha with alpha < 1 flattens
the language distribution, upweighting tail languages and downweighting the
dominant one while keeping the resampled corpus at ~its original size. (The
telemetry analogue is weighted replay of under-represented shards; the operator
lives in the training-data family alongside `docs_sample_stratified`, which is
fixed per-language keep RATES — this one derives the rates from the observed
distribution.)

Determinism contract (same as docs_split / docs_sample_stratified): per-doc copy
counts come from integer policy constants plus a content-independent id hash —
no RNG state, stable membership across runs, machines, and partitionings. The
policy constants are computed ONCE on the driver from a bounded per-language
count aggregate and inlined into the DuckDB oracle, so the oracle replays the
policy exactly instead of re-deriving driver float math in SQL.

Scale shape: pass 1 is a tiny groupby-count (|langs| rows reach the driver);
pass 2 is one stateless map_batches that expands each batch with np.repeat —
no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

REPEAT_SCALE = 1_000_000  # fractional repeats resolved in millionths of the id hash


def temperature_repeats(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, tuple[int, int]]:
    """Per-language deterministic repeat policy.

    Expected copies per doc of language l: r_l = T * w_l / c_l with
    w_l = c_l^alpha / sum_m c_m^alpha and T = sum_m c_m, so the output corpus
    holds ~T rows. Returns (base_l, extra_millionths_l): every doc gets base_l
    copies, and docs whose fnv1a32(id) % 1e6 falls below extra get one more.
    Languages are reduced in sorted order so the float summation order is fixed
    — the integers round-trip exactly into SQL literals."""
    langs = sorted(counts)
    c = np.array([float(counts[l]) for l in langs])
    w = c**alpha
    w = w / w.sum()
    r = c.sum() * w / c
    base = np.floor(r).astype(np.int64)
    extra = np.floor((r - base) * REPEAT_SCALE + 0.5).astype(np.int64)
    return {l: (int(b), int(e)) for l, b, e in zip(langs, base, extra)}


def temperature_resample(
    ds: "ray.data.Dataset",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> "ray.data.Dataset":
    """(id, lang, repeat_idx) — each doc repeated per the temperature policy.

    repeat_idx is 0-based per doc; docs drawn down to zero copies (dominant
    language, hash above the fractional threshold) are dropped. The emit is a
    single vectorized np.repeat + arange per batch; the only driver round-trip
    is the |langs|-row count aggregate."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    counts = {
        r[lang_col]: r["count()"] for r in ds.groupby(lang_col).count().take_all()
    }
    reps = temperature_repeats(counts, alpha)
    langs = sorted(reps)
    base = np.array([reps[l][0] for l in langs], dtype=np.int64)
    extra = np.array([reps[l][1] for l in langs], dtype=np.int64)
    lang_arr = pa.array(langs)

    def emit(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string()).combine_chunks()
        h = (fnv1a32_arrow(ids) % np.uint64(REPEAT_SCALE)).astype(np.int64)
        li = (
            pc.index_in(t[lang_col], value_set=lang_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = base[li] + (h < extra[li])
        idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        rep = np.arange(idx.size, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        out = t.select([id_col, lang_col]).take(pa.array(idx))
        return out.append_column("repeat_idx", pa.array(rep, pa.int64()))

    return ds.map_batches(emit, batch_format="pyarrow")


def negative_samples(
    ds: "ray.data.Dataset",
    n_docs: int,
    k: int = 4,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic negative sampling for contrastive training: each doc gets
    ``k`` pseudo-random partner ids drawn by hashing (doc_id, j) over the
    dense id range [0, n_docs) — no RNG state, rerun-stable, and shuffle-FREE
    (a stateless k× row expansion inside map_batches; the pairing never needs
    the partner row, so nothing joins).

    Self-collisions step to the next id mod n_docs so a doc is never its own
    negative. ``n_docs`` is the one piece of global state (one int — count the
    corpus once)."""
    from ..functions.hashing import fnv1a32_arrow

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id = np.repeat(ids, k)
        j = np.tile(np.arange(k, dtype=np.int64), len(ids))
        key = pc.binary_join_element_wise(
            pa.array(out_id.astype(str)), pa.array(j.astype(str)), ":"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        neg = (fnv1a32_arrow(key) % np.uint64(n_docs)).astype(np.int64)
        neg = np.where(neg == out_id, (neg + 1) % n_docs, neg)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "neg_idx": pa.array(j, pa.int64()),
                "neg_id": pa.array(neg, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")
