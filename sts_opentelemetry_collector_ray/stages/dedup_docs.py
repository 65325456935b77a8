"""Document deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data-pipeline operators over the `documents` / `embeddings` tables
(SURVEY.md scope extension). Shared scale pattern: per-batch vectorized signature
computation → explode to (bucket, doc) rows → `groupby(bucket)` co-locates candidates
→ vectorized verification inside the group → candidate pairs. Connected-component
clustering is left to a driver-side union-find over the (small) verified pair set;
at 100 TB the pair set is the operator's contract and clustering is a follow-on
groupby round (documented in each function).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, fnv1a64_array

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: "ray.data.Dataset", key_col: str = "text", id_col: str = "doc_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """First-wins exact dedup by content (keep min id per identical text).

    Two-level: per-batch combiner, then hash-bucket exchange with vectorized
    per-bucket first-wins (same shape as the routed-row dedup, stages/dedup.py)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").drop_duplicates(key_col, keep="first")
        h = fnv1a64_array(df[key_col].to_numpy(dtype=object))
        return df.assign(_bucket=(h % num_buckets).astype(np.int32))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").drop_duplicates(key_col, keep="first")
        return df.drop(columns=["_bucket"])

    pre = ds.map_batches(local, batch_format="pandas")
    return pre.groupby("_bucket").map_groups(bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    s = " ".join(str(text).lower().split())
    if len(s) < k:
        return np.array([fnv1a64(s)], dtype=np.uint64) if s else np.array([], dtype=np.uint64)
    return np.unique(
        fnv1a64_array([s[i : i + k] for i in range(len(s) - k + 1)])
    )


def _minhash(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None]
    with np.errstate(over="ignore"):
        hv = (x * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs via MinHash banding, verified by true shingle-set
    Jaccard (guide pattern: shingle → minhash → band → bucket groupby → verify).

    Output: (a, b, jaccard) with a < b, Jaccard ≥ threshold. Pair verification
    re-shingles the two texts inside the band group — the texts ride along with the
    band rows so verification needs no second join; at 100 TB swap the ride-along for
    a gather against the doc store (documented trade-off: bandwidth vs join)."""
    rows_per_band = num_perm // bands
    a_par, b_par = _perm_params(num_perm, seed)

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in df.iterrows():
            sh = _shingles(row[text_col], shingle_k)
            mh = _minhash(sh, a_par, b_par)
            for band in range(bands):
                chunk = mh[band * rows_per_band : (band + 1) * rows_per_band]
                bh = fnv1a64(chunk.tobytes())
                out.append(
                    {
                        "band": band,
                        "band_hash": np.uint64(bh),
                        id_col: row[id_col],
                        text_col: row[text_col],
                    }
                )
        return pd.DataFrame(out)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "jaccard": pd.Series(dtype=np.float64)})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_numpy()
        sh = [set(_shingles(t, shingle_k).tolist()) for t in texts]
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                jac = inter / union if union else 0.0
                if jac >= jaccard_threshold:
                    out.append((int(ids[i]), int(ids[j]), round(jac, 6)))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    sig = ds.map_batches(sigs, batch_format="pandas")
    pairs = sig.groupby(["band", "band_hash"]).map_groups(verify, batch_format="pandas")
    # same pair can surface from multiple bands — exact-dedup the pair list
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """64-bit SimHash over whitespace tokens (weighted bit-vote)."""
    out = np.zeros(len(df), dtype=np.uint64)
    for i, txt in enumerate(df[text_col].to_numpy(dtype=object)):
        toks = str(txt).lower().split()
        if not toks:
            continue
        hv = fnv1a64_array(toks)
        votes = np.zeros(64, dtype=np.int64)
        for bit in range(64):
            mask = (hv >> np.uint64(bit)) & np.uint64(1)
            votes[bit] = int(mask.sum()) * 2 - len(hv)
        sh = np.uint64(0)
        for bit in range(64):
            if votes[bit] > 0:
                sh |= np.uint64(1) << np.uint64(bit)
        out[i] = sh
    return df.assign(simhash=out)


def simhash_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming distance ≤ k via block-LSH: split the 64-bit
    SimHash into k+1 blocks — any pair within distance k shares ≥1 exact block
    (pigeonhole), so exploding to (block_idx, block_value) rows and grouping finds
    all candidates with one shuffle."""
    blocks = max_hamming + 1
    bits = 64 // blocks

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = simhash_batch(df, text_col)
        rows = []
        sh = df["simhash"].to_numpy(dtype=np.uint64)
        ids = df[id_col].to_numpy()
        for bi in range(blocks):
            shift = np.uint64(bi * bits)
            width = np.uint64(bits if bi < blocks - 1 else 64 - bi * bits)
            mask = (np.uint64(1) << width) - np.uint64(1)
            val = (sh >> shift) & mask
            rows.append(
                pd.DataFrame(
                    {"block": bi, "block_val": val, id_col: ids, "simhash": sh}
                )
            )
        return pd.concat(rows, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy(dtype=np.uint64)
        out = []
        for i in range(len(ids)):
            x = sh[i] ^ sh[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.nonzero(ham <= max_hamming)[0]:
                out.append((int(ids[i]), int(ids[i + 1 + off]), int(ham[off])))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    sig = ds.map_batches(explode, batch_format="pandas")
    pairs = sig.groupby(["block", "block_val"]).map_groups(verify, batch_format="pandas")
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, small-N verification oracle for the LSH variants)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Exact all-pairs n-gram Jaccard ≥ threshold via block-pair join: each doc is
    assigned a bucket; every bucket PAIR (i ≤ j) becomes a group so all doc pairs
    are compared exactly once. O(B²) groups — the exact quadratic baseline used to
    validate the LSH operators; not the 100 TB path (use minhash_lsh_pairs there)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            pd.util.hash_array(df[id_col].to_numpy()) % num_buckets
        ).astype(np.int64)
        rows = []
        for bi in range(num_buckets):
            for bj in range(num_buckets):
                if bi > bj:
                    continue
                sel = (h == bi) | (h == bj)
                if not sel.any():
                    continue
                sub = df.loc[sel, [id_col, text_col]].copy()
                sub["gi"] = bi
                sub["gj"] = bj
                rows.append(sub)
        return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            columns=[id_col, text_col, "gi", "gj"]
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(g["gi"].iloc[0]), int(g["gj"].iloc[0])
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        h = (pd.util.hash_array(ids) % num_buckets).astype(np.int64)
        sh = [set(_shingles(t, shingle_k).tolist()) for t in g[text_col].to_numpy()]
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                hi, hj = sorted((h[i], h[j]))
                if (hi, hj) != (gi, gj):
                    continue  # this pair belongs to another bucket-pair group
                union = len(sh[i] | sh[j])
                jac = len(sh[i] & sh[j]) / union if union else 0.0
                if jac >= threshold:
                    out.append((int(ids[i]), int(ids[j]), round(jac, 6)))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    ex = ds.map_batches(explode, batch_format="pandas")
    return ex.groupby(["gi", "gj"]).map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    num_buckets: int = 8,
) -> "ray.data.Dataset":
    """Pairs with cosine similarity ≥ threshold (float64, exact) via the same
    block-pair join as ngram_jaccard_pairs, with a numpy matmul per group. The
    scale path replaces the O(B²) exact join with LSH bucketing
    (similarity.lsh_topk); this operator is the exact baseline."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[id_col].to_numpy() % num_buckets).astype(np.int64)
        rows = []
        for bi in range(num_buckets):
            for bj in range(bi, num_buckets):
                sel = (h == bi) | (h == bj)
                if not sel.any():
                    continue
                sub = df.loc[sel, [id_col, vec_col]].copy()
                sub["gi"] = bi
                sub["gj"] = bj
                rows.append(sub)
        return pd.concat(rows, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(g["gi"].iloc[0]), int(g["gj"].iloc[0])
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T
        h = (ids % num_buckets).astype(np.int64)
        out = []
        iu, ju = np.triu_indices(len(ids), k=1)
        for i, j in zip(iu, ju):
            hi, hj = sorted((h[i], h[j]))
            if (hi, hj) != (gi, gj):
                continue
            if sim[i, j] >= threshold:
                out.append((int(ids[i]), int(ids[j])))
        return pd.DataFrame(out, columns=["a", "b"])

    ex = ds.map_batches(explode, batch_format="pandas")
    return ex.groupby(["gi", "gj"]).map_groups(verify, batch_format="pandas")
