"""Document deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data-pipeline operators over the `documents` / `embeddings` tables
(SURVEY.md scope extension). Shared scale pattern: per-batch WHOLE-BATCH vectorized
signature computation (reduceat segment kernels, no per-row loops) → explode to
(bucket, doc, signature) rows — signatures only, the document text never enters the
shuffle → `groupby(bucket)` co-locates candidates → vectorized verification inside
the group → candidate pairs → bounded-bucket pair dedup (`dedup_pair_list`; a pair
key is unbounded-cardinality, so never `groupby(pair)`). Clustering the verified
pair set is `stages/clusters.py::connected_components_distributed`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, fnv1a64_array


def _round6(x: float) -> float:
    """Half-AWAY-from-zero at 6 decimals (DuckDB ROUND; Python round is half-even
    and flips exact ties like 9/128)."""
    return float(np.floor(x * 1e6 + 0.5) / 1e6)

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


def _minhash_signatures(
    texts: np.ndarray,
    a_par: np.ndarray,
    b_par: np.ndarray,
    shingle_k: int,
    max_chunk_shingles: int = 131_072,
) -> np.ndarray:
    """Whole-batch MinHash: ALL shingles of a doc slice are hashed in one
    vectorized call, then per-doc minima fall out of ONE `np.minimum.reduceat`
    over the (shingles × permutations) matrix — no per-doc Python in the hash or
    min path. ``max_chunk_shingles`` bounds the intermediate matrix (~64 MB at
    the default 64 permutations)."""
    num_perm = len(a_par)
    n = len(texts)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    i = 0
    while i < n:
        shingle_lists: list[list[str]] = []
        total = 0
        j = i
        while j < n and (total == 0 or total < max_chunk_shingles):
            s = " ".join(str(texts[j]).lower().split())
            if len(s) < shingle_k:
                sl = [s] if s else []
            else:
                sl = [s[t : t + shingle_k] for t in range(len(s) - shingle_k + 1)]
            shingle_lists.append(sl)
            total += len(sl)
            j += 1
        cnt = np.array([len(sl) for sl in shingle_lists], dtype=np.int64)
        block = np.full((j - i, num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
        flat = [sh for sl in shingle_lists for sh in sl]
        if flat:
            h = fnv1a64_array(flat).astype(np.uint64)
            with np.errstate(over="ignore"):
                hv = (h[:, None] * a_par[None, :] + b_par[None, :]) % np.uint64(
                    _MERSENNE
                )
            nz = cnt > 0
            starts = np.concatenate([[0], np.cumsum(cnt[nz])[:-1]]).astype(np.int64)
            block[nz] = np.minimum.reduceat(hv, starts, axis=0)
        sigs[i:j] = block
        i = j
    return sigs


def _fnv64_byte_matrix(mat: np.ndarray) -> np.ndarray:
    """Row-wise FNV-1a64 over a fixed-width uint8 matrix — vectorized across rows."""
    acc = np.full(len(mat), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for c in range(mat.shape[1]):
            acc = (acc ^ mat[:, c].astype(np.uint64)) * prime
    return acc


def dedup_pair_list(
    pairs: "ray.data.Dataset", num_buckets: int = 32
) -> "ray.data.Dataset":
    """Exact (a, b) pair dedup via a BOUNDED bucket exchange + one vectorized
    `drop_duplicates` per bucket — never one Python group per pair (the same
    two-level shape as `exact_dedup`; a pair key is unbounded-cardinality)."""

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        h = pd.util.hash_array((a * np.int64(1_000_003)) ^ b) % num_buckets
        return df.assign(_bucket=h.astype(np.int32))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"])
        df = df.sort_values(list(df.columns), kind="mergesort")
        return df.drop_duplicates(["a", "b"], keep="first")

    return (
        pairs.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


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
    """Candidate near-dup pairs via MinHash banding, verified by SIGNATURE Jaccard
    (the unbiased estimator: fraction of agreeing permutations).

    Scale design: band rows carry (band, band_hash, doc_id, signature-bytes) — the
    512-byte signature, never the document text, so the shuffle moves
    O(bands × 512 B) per doc regardless of document size. Signature computation is
    whole-batch vectorized (`_minhash_signatures`); verification inside each band
    group is one numpy equality-mean per anchor row; the multi-band pair dedup is
    the bounded-bucket `dedup_pair_list`, not a per-pair group.

    Output: (a, b, jaccard) with a < b, estimated Jaccard ≥ threshold."""
    rows_per_band = num_perm // bands
    a_par, b_par = _perm_params(num_perm, seed)

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"band": pd.Series(dtype=np.int32),
                 "band_hash": pd.Series(dtype=np.uint64),
                 id_col: pd.Series(dtype=np.int64),
                 "sig": pd.Series(dtype=object)}
            )
        mh = _minhash_signatures(
            df[text_col].to_numpy(dtype=object), a_par, b_par, shingle_k
        )
        sig_bytes = [row.tobytes() for row in mh]
        ids = df[id_col].to_numpy()
        frames = []
        for band in range(bands):
            chunk = mh[:, band * rows_per_band : (band + 1) * rows_per_band]
            bh = _fnv64_byte_matrix(
                np.ascontiguousarray(chunk).view(np.uint8).reshape(n, -1)
            )
            frames.append(
                pd.DataFrame(
                    {"band": np.int32(band), "band_hash": bh, id_col: ids,
                     "sig": sig_bytes}
                )
            )
        return pd.concat(frames, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "jaccard": pd.Series(dtype=np.float64)})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sig = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        out = []
        for i in range(len(ids) - 1):
            est = (sig[i + 1 :] == sig[i]).mean(axis=1)
            for off in np.nonzero(est >= jaccard_threshold)[0]:
                out.append((int(ids[i]), int(ids[i + 1 + off]), _round6(float(est[off]))))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    sig = ds.map_batches(sigs, batch_format="pandas")
    pairs = sig.groupby(["band", "band_hash"]).map_groups(verify, batch_format="pandas")
    # same pair can surface from multiple bands — bounded-bucket exact dedup
    return dedup_pair_list(pairs)


def neardup_dedup_docs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_buckets: int = 64,
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """Near-dup DEDUP, keep-one-per-cluster: MinHash-LSH pairs → in-cluster
    connected components → drop every non-representative doc (its component
    label < its own id) via a bucketed ANTI-JOIN — the drop set never rides
    through the driver or a broadcast, so an adversarial corpus that is 90%
    duplicates still streams.

    NOTE: ``ds`` is consumed twice (signature pass, anti-join pass) — pass a
    re-readable source (``read_parquet``), not an expensive derived pipeline
    (branching a lazy Dataset re-executes its upstream per branch)."""
    from .clusters import connected_components_distributed

    pairs = minhash_lsh_pairs(
        ds, text_col=text_col, id_col=id_col,
        jaccard_threshold=jaccard_threshold, **lsh_kwargs,
    )
    labels = connected_components_distributed(pairs)

    def drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dup = t.filter(pc.not_equal(t["node"], t["label"]))
        return pa.table({id_col: dup["node"].cast(pa.int64())})

    drop_ids = labels.map_batches(drops, batch_format="pyarrow")

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        b = (pd.util.hash_array(df[id_col].to_numpy().astype(np.int64)) % num_buckets).astype(np.int32)
        return pd.DataFrame(
            {id_col: df[id_col].astype(np.int64), text_col: df[text_col],
             "_drop": False, "_bucket": b}
        )

    def drop_rows(df: pd.DataFrame) -> pd.DataFrame:
        b = (pd.util.hash_array(df[id_col].to_numpy().astype(np.int64)) % num_buckets).astype(np.int32)
        return pd.DataFrame(
            {id_col: df[id_col].astype(np.int64), text_col: None,
             "_drop": True, "_bucket": b}
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        bad = set(g.loc[g["_drop"], id_col])
        keep = g[~g["_drop"] & ~g[id_col].isin(bad)]
        return keep[[id_col, text_col]]

    stream = ds.map_batches(doc_rows, batch_format="pandas").union(
        drop_ids.map_batches(drop_rows, batch_format="pandas")
    )
    return stream.groupby("_bucket").map_groups(
        lambda g: anti(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """64-bit SimHash over whitespace tokens (majority bit-vote), whole-batch
    vectorized: one hash call over every token in the batch, all 64 bit-votes at
    once via `np.unpackbits`, per-doc sums via `np.add.reduceat`, repacked with
    `np.packbits` — no per-row or per-bit Python loops."""
    out = np.zeros(len(df), dtype=np.uint64)
    tok_lists = [str(t).lower().split() for t in df[text_col].to_numpy(dtype=object)]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [w for toks in tok_lists for w in toks]
    if flat:
        hv = fnv1a64_array(flat).astype(np.uint64)
        # (tokens, 64) bit matrix, bit index == (value >> bit) & 1
        bits = np.unpackbits(
            hv.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)
        nz = counts > 0
        starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]]).astype(np.int64)
        votes = np.add.reduceat(bits, starts, axis=0)  # (nz_docs, 64)
        maj = (votes * 2) > counts[nz][:, None]  # votes[b]*2 - n > 0
        out[nz] = np.packbits(
            maj.astype(np.uint8), axis=1, bitorder="little"
        ).view(np.uint64).ravel()
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
        for i in range(len(ids) - 1):
            x = sh[i] ^ sh[i + 1 :]
            # vectorized popcount: unpack XOR words to bits, sum per row
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            for off in np.nonzero(ham <= max_hamming)[0]:
                out.append((int(ids[i]), int(ids[i + 1 + off]), int(ham[off])))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    sig = ds.map_batches(explode, batch_format="pandas")
    pairs = sig.groupby(["block", "block_val"]).map_groups(verify, batch_format="pandas")
    # multi-block duplicates collapse via the bounded-bucket pair dedup
    return dedup_pair_list(pairs)


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
                    out.append((int(ids[i]), int(ids[j]), _round6(jac)))
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
    from ..functions.vectors import stack_list_column

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
        mat = stack_list_column(g[vec_col], np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T
        h = (ids % num_buckets).astype(np.int64)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = (
            (np.minimum(h[iu], h[ju]) == gi)
            & (np.maximum(h[iu], h[ju]) == gj)
            & (sim[iu, ju] >= threshold)
        )
        return pd.DataFrame({"a": ids[iu][keep], "b": ids[ju][keep]})

    ex = ds.map_batches(explode, batch_format="pandas")
    return ex.groupby(["gi", "gj"]).map_groups(verify, batch_format="pandas")


def _word_grams(
    t: "pa.Table", gram_n: int, id_col: str, text_col: str, probe_mod: int
) -> tuple["pa.Array", np.ndarray, np.ndarray]:
    """(flat word-gram strings, per-row gram counts, probe mask) for a batch —
    all Arrow kernels (split, shifted slices, one element-wise join)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    toks = pc.split_pattern(pc.fill_null(t[text_col], ""), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    gcounts = np.maximum(counts - (gram_n - 1), 0)
    n_flat = len(flat)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    ok = np.ones(max(n_flat - (gram_n - 1), 0), dtype=bool)
    if len(ok):
        ok = row_idx[: len(ok)] == row_idx[gram_n - 1 :]
    parts = [flat.slice(i, max(n_flat - (gram_n - 1), 0)) for i in range(gram_n)]
    sel = pa.array(ok)
    joined = parts[0].filter(sel)
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p.filter(sel), " ")
    ids = pc.cast(t[id_col], pa.string()).combine_chunks()
    probe = (fnv1a32_arrow(ids) % np.uint64(probe_mod)) == 0
    return joined, gcounts, probe


_PROBE_DEDUP_BUCKETS = 64  # bounded → safe for groupby().map_groups (CLAUDE.md rule)


def contamination_check(
    ds: "ray.data.Dataset",
    probe_mod: int = 20,
    gram_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_ds: "ray.data.Dataset | None" = None,
    broadcast_budget_bytes: int = 256 << 20,
) -> "ray.data.Dataset":
    """Benchmark-contamination scan: flag training docs sharing any word
    ``gram_n``-gram with a held-out probe set.

    ``probe_ds`` is the held-out benchmark corpus (same schema). When omitted,
    the probe split is carved from ``ds`` itself as ``fnv1a32(doc_id) %
    probe_mod == 0`` — deterministic, for self-contained tests/oracles.

    Scale design (the probe side is orders of magnitude smaller than the
    100 TB training side, but NOT driver-sized in raw-string form):
      1. per-batch: unique gram strings → FNV-1a64 → unique u64 hashes,
         bucketed by ``h % 64``;
      2. distributed dedup: bounded-bucket ``groupby().map_groups`` unique —
         duplicate grams across batches never reach the driver;
      3. the globally-deduped u64 set (8 B/gram, not Σ|gram| strings) is
         checked against ``broadcast_budget_bytes`` and broadcast once via
         ``ray.put`` (the small-side pattern — ST4);
      4. the training side streams through ONE ``map_batches`` doing a
         sorted-array ``searchsorted`` membership kernel per batch. No shuffle
         ever touches the big side.
    Hash membership is exact vs the DuckDB oracle because the oracle replays
    FNV-1a64 over gram bytes in HUGEINT (collisions, if any, agree).

    Output: one row per contaminated non-probe doc — (doc_id, n_shared) where
    n_shared counts its DISTINCT gram hashes present in the probe set.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    def _grams(t: pa.Table) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        return _word_grams(t, gram_n, id_col, text_col, probe_mod)

    if probe_ds is None:

        def probe_hashes(t: pa.Table) -> pa.Table:
            joined, gcounts, probe = _grams(t)
            keep = np.repeat(probe, gcounts)
            u = pc.unique(joined.filter(pa.array(keep)))
            h = np.unique(fnv1a64_arrow(u)) if len(u) else np.empty(0, np.uint64)
            return pa.table(
                {
                    "b": pa.array((h % _PROBE_DEDUP_BUCKETS).astype(np.int64)),
                    "h": pa.array(h, pa.uint64()),
                }
            )

        probe_src = ds
    else:

        def probe_hashes(t: pa.Table) -> pa.Table:
            joined, _, _ = _word_grams(t, gram_n, id_col, text_col, 1)
            u = pc.unique(joined)
            h = np.unique(fnv1a64_arrow(u)) if len(u) else np.empty(0, np.uint64)
            return pa.table(
                {
                    "b": pa.array((h % _PROBE_DEDUP_BUCKETS).astype(np.int64)),
                    "h": pa.array(h, pa.uint64()),
                }
            )

        probe_src = probe_ds

    def bucket_unique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": np.unique(g["h"].to_numpy())})

    deduped = (
        probe_src.map_batches(probe_hashes, batch_format="pyarrow")
        .groupby("b")
        .map_groups(bucket_unique, batch_format="pandas")
    )
    dedup_df = deduped.to_pandas()
    # an all-empty probe side yields a schema-less empty frame (CLAUDE.md:
    # Ray groupby on empty input drops the schema) — treat as an empty set
    probe_arr = (
        np.sort(dedup_df["h"].to_numpy(dtype=np.uint64))
        if "h" in dedup_df.columns
        else np.empty(0, np.uint64)
    )
    if probe_arr.nbytes > broadcast_budget_bytes:
        raise ValueError(
            f"probe gram-hash set is {probe_arr.nbytes} B, over the broadcast "
            f"budget of {broadcast_budget_bytes} B — shrink the probe set or "
            "switch to bloom_contamination"
        )
    probe_set = ray.put(probe_arr)

    def scan(t: pa.Table) -> pa.Table:
        grams_ref = ray.get(probe_set)
        joined, gcounts, probe = _grams(t)
        if probe_ds is not None:
            probe = np.zeros(len(gcounts), dtype=bool)
        row_idx = np.repeat(np.arange(len(gcounts), dtype=np.int64), gcounts)
        h = fnv1a64_arrow(joined) if len(joined) else np.empty(0, np.uint64)
        if len(grams_ref) == 0:
            # empty probe hash set (empty probe_ds, or no doc with
            # fnv%probe_mod==0): indexing an empty array would raise
            hit = np.zeros(len(h), dtype=bool)
        else:
            pos = np.searchsorted(grams_ref, h)
            pos_c = np.minimum(pos, len(grams_ref) - 1)
            hit = grams_ref[pos_c] == h
        # distinct shared gram hashes per row: unique (row, hash) pairs
        sub = pa.table(
            {"r": pa.array(row_idx[hit]), "g": pa.array(h[hit], pa.uint64())}
        )
        d = sub.group_by(["r", "g"]).aggregate([]).group_by(["r"]).aggregate([("g", "count")])
        n_shared = np.zeros(len(gcounts), dtype=np.int64)
        if d.num_rows:
            n_shared[d["r"].to_numpy()] = d["g_count"].to_numpy()
        keep = (~probe) & (n_shared > 0)
        return pa.table(
            {id_col: t[id_col], "n_shared": pa.array(n_shared, pa.int64())}
        ).filter(pa.array(keep))

    return ds.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the O(1)-memory probe structure at scale
# ---------------------------------------------------------------------------

BLOOM_BITS = 65536  # ~10+ bits per probe gram at the gate scale; size with the probe set
BLOOM_K = 5


def _bloom_positions(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch–Mitzenmacher double hashing off ONE
    fnv1a64: pos_j = (h % m + j * (1 + (h >> 33) % (m-1))) % m. Pure uint64
    arithmetic — the DuckDB oracle replays it in HUGEINT exactly."""
    h = np.asarray(h, dtype=np.uint64)
    h1 = h % np.uint64(n_bits)
    h2 = (h >> np.uint64(33)) % np.uint64(n_bits - 1) + np.uint64(1)
    j = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(n_bits)


def bloom_contamination(
    ds: "ray.data.Dataset",
    probe_mod: int = 20,
    gram_n: int = 5,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """`contamination_check` with the probe set compressed into a Bloom filter:
    the structure a 100 TB run actually broadcasts when the benchmark suite is
    too large for an exact string set (bits are O(n_bits) regardless of probe
    size vs. the exact set's O(Σ|gram|)). False positives are INHERENT and
    DETERMINISTIC (FNV double hashing, no RNG), so the DuckDB oracle replays
    membership — including every false positive — bit-for-bit.

    Output: (doc_id, n_flagged) per non-probe doc with ≥1 distinct gram whose
    k bloom bits are all set by the probe side."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    def probe_bits(t: pa.Table) -> pa.Table:
        joined, gcounts, probe = _word_grams(t, gram_n, id_col, text_col, probe_mod)
        keep = np.repeat(probe, gcounts)
        u = pc.unique(joined.filter(pa.array(keep)))
        pos = np.unique(_bloom_positions(fnv1a64_arrow(u), n_bits, k))
        return pa.table({"bit": pa.array(pos.astype(np.int64), pa.int64())})

    # probe side: bounded — distinct set bits, not grams, reach the driver
    bits_tbl = ds.map_batches(probe_bits, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(n_bits, dtype=bool)
    bloom[np.unique(bits_tbl["bit"].to_numpy())] = True
    bloom_ref = ray.put(bloom)

    def scan(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        joined, gcounts, probe = _word_grams(t, gram_n, id_col, text_col, probe_mod)
        row_idx = np.repeat(np.arange(len(gcounts), dtype=np.int64), gcounts)
        pos = _bloom_positions(fnv1a64_arrow(joined), n_bits, k)
        hit = bits[pos].all(axis=1)
        sub = pa.table(
            {"r": pa.array(row_idx[hit]), "g": joined.filter(pa.array(hit))}
        )
        d = (
            sub.group_by(["r", "g"]).aggregate([])
            .group_by(["r"]).aggregate([("g", "count")])
        )
        n_flagged = np.zeros(len(gcounts), dtype=np.int64)
        if d.num_rows:
            n_flagged[d["r"].to_numpy()] = d["g_count"].to_numpy()
        keep = (~probe) & (n_flagged > 0)
        return pa.table(
            {id_col: t[id_col], "n_flagged": pa.array(n_flagged, pa.int64())}
        ).filter(pa.array(keep))

    return ds.map_batches(scan, batch_format="pyarrow")


def neardup_best_docs(
    ds: "ray.data.Dataset",
    quality_col: str = "n_chars",
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_buckets: int = 64,
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """Near-dup dedup keeping the BEST doc per cluster (not the first): the
    production dedup recipe keeps the highest-quality member of each near-dup
    family (longest / best-scored), not an arbitrary representative.

    MinHash-LSH pairs → in-cluster connected components → (1) one bucketed
    merge by doc_id assigns each doc its component label (own id when it is in
    no component), (2) one bucketed exchange by LABEL elects the per-cluster
    winner with a vectorized sort + first-wins (max quality, tie → min id).
    Both exchanges are bounded-bucket; neither the drop set nor the labels
    ever ride through the driver.

    ``ds`` is consumed twice (signatures, election) — pass a re-readable
    source, not a derived lazy pipeline (CLAUDE.md branch rule)."""
    from .clusters import connected_components_distributed

    pairs = minhash_lsh_pairs(
        ds, text_col=text_col, id_col=id_col,
        jaccard_threshold=jaccard_threshold, **lsh_kwargs,
    )
    labels = connected_components_distributed(pairs)

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        b = (
            pd.util.hash_array(ids.to_numpy(zero_copy_only=False)) % num_buckets
        ).astype(np.int32)
        return pa.table(
            {
                id_col: ids,
                "_q": t[quality_col].combine_chunks().cast(pa.int64()),
                "_label": pa.array(np.full(len(t), -1, dtype=np.int64)),
                "_bucket": pa.array(b, pa.int32()),
            }
        )

    def label_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        node = t["node"].cast(pa.int64())
        b = (
            pd.util.hash_array(node.to_numpy(zero_copy_only=False)) % num_buckets
        ).astype(np.int32)
        return pa.table(
            {
                id_col: node,
                "_q": pa.array(np.full(len(t), -1, dtype=np.int64)),
                "_label": t["label"].cast(pa.int64()),
                "_bucket": pa.array(b, pa.int32()),
            }
        )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["_label"] >= 0].set_index(id_col)["_label"]
        docs = g[g["_label"] < 0]
        out = docs[[id_col, "_q"]].copy()
        mapped = docs[id_col].map(lab)
        out["_label"] = mapped.fillna(docs[id_col]).astype(np.int64)
        return out

    merged = (
        ds.map_batches(doc_rows, batch_format="pyarrow")
        .union(labels.map_batches(label_rows, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(lambda g: assign(g.drop(columns=["_bucket"])), batch_format="pandas")
    )

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_lbucket"] = (
            pd.util.hash_array(df["_label"].to_numpy(dtype=np.int64)) % num_buckets
        ).astype(np.int32)
        return df

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        # max quality wins, tie → min id: one vectorized sort + first-wins
        w = g.sort_values(["_label", "_q", id_col], ascending=[True, False, True])
        w = w.drop_duplicates("_label", keep="first")
        return w[[id_col]]

    return (
        merged.map_batches(rebucket, batch_format="pandas")
        .groupby("_lbucket")
        .map_groups(lambda g: elect(g.drop(columns=["_lbucket"])), batch_format="pandas")
    )
