"""Model-free quality classification and importance weighting over documents.

Two operators the big public LLM-data pipelines run corpus-wide and that the
reference's processor family has no analogue for:

- ``hash_classifier_batch`` — a fastText-shaped hashed n-gram linear classifier
  (Joulin et al. 2016): unigram + bigram features hashed into a fixed bucket
  table, one integer weight per bucket, per-doc score = sum of weights.  The
  weight table here is derived deterministically from the bucket index (no
  trained artifact ships with the repo), so the full kernel — tokenize, hash,
  look up, reduce — is byte-exact replayable in SQL while keeping the exact
  runtime shape of a trained-classifier scoring pass (broadcast weight vector,
  vectorized per-batch lookup, zero shuffles).

- ``dsir_pipeline`` — DSIR-style importance weights (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling"): hashed-unigram
  bag-of-words distributions are fit for the TARGET slice (here: ``lang ==
  target_lang``) and the RAW corpus in ONE streaming pass (per-batch bincount
  combiner -> |buckets|-row aggregate), the per-bucket log-likelihood ratios
  are broadcast, and a second pass scores every document.  Ratios are stored
  as integer micro-nats so per-doc sums are order-independent and exact.

Scale shape: the only aggregate state is ``n_buckets`` rows (256/512), so the
fit is a tiny shuffle no matter the corpus size; scoring is a stateless
map_batches over broadcast constants.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import fnv1a32, fnv1a32_arrow

CLASSIFIER_BUCKETS = 512
DSIR_BUCKETS = 256


def classifier_weights(n_buckets: int = CLASSIFIER_BUCKETS) -> np.ndarray:
    """Deterministic integer weight per bucket: fnv1a32("w:<b>") % 2001 - 1000,
    i.e. uniform in [-1000, 1000].  Stands in for a trained coefficient vector;
    swap in real fastText weights without touching the scoring kernel."""
    return np.array(
        [fnv1a32(f"w:{b}") % 2001 - 1000 for b in range(n_buckets)], dtype=np.int64
    )


_W = classifier_weights()


def _tokenize(t: pa.Table, col: str):
    """Split on single spaces, nulls as '' — the corpus-wide tokenization
    contract shared with lm_score_pipeline / the vocab oracles (a '' text
    yields one empty token, mirroring SQL string_split)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(pc.fill_null(t[col], ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    return toks.flatten(), counts


def _bigram_features(flat: pa.Array, counts: np.ndarray):
    """Adjacent-word pairs within each doc over the flattened token stream."""
    import pyarrow.compute as pc

    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    ok = row_idx[:-1] == row_idx[1:] if len(row_idx) > 1 else np.zeros(0, dtype=bool)
    sel = pa.array(ok)
    left = flat.slice(0, max(len(flat) - 1, 0)).filter(sel)
    right = flat.slice(1).filter(sel)
    return pc.binary_join_element_wise(left, right, " ")


def hash_classifier_batch(
    t: pa.Table, col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Score one batch: features = 'u:'+word and 'b:'+w1+' '+w2, bucket =
    fnv1a32(feature) % 512, score = sum of integer bucket weights over all
    feature OCCURRENCES.  Output (id, n_feat, score_int, quality_pass)."""
    import pyarrow.compute as pc

    flat, counts = _tokenize(t, col)
    n = len(counts)

    uni = pc.binary_join_element_wise("u:", flat, "")
    bi_raw = _bigram_features(flat, counts)
    bi = pc.binary_join_element_wise("b:", bi_raw, "")

    w_uni = _W[fnv1a32_arrow(uni) % np.uint64(CLASSIFIER_BUCKETS)]
    w_bi = _W[fnv1a32_arrow(bi) % np.uint64(CLASSIFIER_BUCKETS)]

    n_bi = np.maximum(counts - 1, 0)
    score = np.zeros(n, dtype=np.int64)
    if len(w_uni):
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        nz = counts > 0
        if nz.any():
            score[nz] += np.add.reduceat(w_uni, starts[nz])
    if len(w_bi):
        bstarts = np.concatenate([[0], np.cumsum(n_bi)[:-1]]).astype(np.int64)
        bnz = n_bi > 0
        if bnz.any():
            score[bnz] += np.add.reduceat(w_bi, bstarts[bnz])

    return pa.table(
        {
            id_col: t[id_col],
            "n_feat": pa.array(counts + n_bi, pa.int64()),
            "score_int": pa.array(score, pa.int64()),
            "quality_pass": pa.array(score > 0, pa.bool_()),
        }
    )


def _dsir_lambdas(
    cnt_raw: np.ndarray, cnt_tgt: np.ndarray, n_buckets: int = DSIR_BUCKETS
) -> np.ndarray:
    """Per-bucket add-one-smoothed log-likelihood ratio ln P_target/P_raw in
    integer MICRO-NATS (floor(x*1e6 + .5)) so downstream sums are exact."""
    big_r = float(cnt_raw.sum())
    big_t = float(cnt_tgt.sum())
    lam = (
        np.log(cnt_tgt + 1.0)
        - np.log(big_t + n_buckets)
        - np.log(cnt_raw + 1.0)
        + np.log(big_r + n_buckets)
    )
    return np.floor(lam * 1e6 + 0.5).astype(np.int64)


def dsir_pipeline(
    ds: "ray.data.Dataset",
    target_lang: str = "en",
    col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = DSIR_BUCKETS,
) -> "ray.data.Dataset":
    """DSIR importance weights: ONE fit pass emits per-batch (bucket, cnt_raw,
    cnt_target) bincount partials (raw and target slices share the pass), a
    |buckets|-row aggregate lands on the driver (bounded: 256 rows regardless
    of corpus size), the micro-nat ratio vector is broadcast with ``ray.put``,
    and a second pass scores each doc as the sum of its tokens' ratios.

    NOTE: ``ds`` is consumed twice (fit, score) — hand it a re-readable source
    (read_parquet), not a derived lazy pipeline (CLAUDE.md branch rule)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def fit_partial(t: pa.Table) -> pa.Table:
        flat, counts = _tokenize(t, col)
        b = (fnv1a32_arrow(flat) % np.uint64(n_buckets)).astype(np.int64)
        raw = np.bincount(b, minlength=n_buckets)
        is_tgt = pc.equal(pc.fill_null(t[lang_col], ""), target_lang)
        mask = np.repeat(is_tgt.to_numpy(zero_copy_only=False), counts)
        tgt = np.bincount(b[mask], minlength=n_buckets)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
                "cnt_raw": pa.array(raw.astype(np.int64)),
                "cnt_tgt": pa.array(tgt.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(fit_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt_raw", alias_name="r"), Sum("cnt_tgt", alias_name="t"))
        .to_pandas()
    )
    cnt_raw = np.zeros(n_buckets, dtype=np.float64)
    cnt_tgt = np.zeros(n_buckets, dtype=np.float64)
    bidx = agg["bucket"].to_numpy(dtype=np.int64)
    cnt_raw[bidx] = agg["r"].to_numpy(dtype=np.float64)
    cnt_tgt[bidx] = agg["t"].to_numpy(dtype=np.float64)
    lam_ref = ray.put(_dsir_lambdas(cnt_raw, cnt_tgt, n_buckets))

    def score(t: pa.Table) -> pa.Table:
        lam = ray.get(lam_ref)
        flat, counts = _tokenize(t, col)
        b = (fnv1a32_arrow(flat) % np.uint64(n_buckets)).astype(np.int64)
        vals = lam[b]
        out = np.zeros(len(counts), dtype=np.int64)
        nz = counts > 0
        if nz.any() and len(vals):
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
            out[nz] = np.add.reduceat(vals, starts[nz])
        return pa.table(
            {
                id_col: t[id_col],
                "n_tok": pa.array(counts, pa.int64()),
                "dsir_micro": pa.array(out, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
