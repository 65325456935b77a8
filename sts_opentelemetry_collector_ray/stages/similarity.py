"""Similarity search over an embedding column (`list<float>`).

Two paths, both deterministic:

- `brute_force_topk` — the exact baseline: the query matrix is broadcast once
  (`ray.put`, read per task), each batch computes a numpy matmul against it and emits
  its local top-k per query; a distributed per-query merge (`_merge_topk`,
  bounded `groupby(query_id)`) keeps the global top-k. Only (n_queries × k)
  rows per batch leave the workers, and only the final q·k reach the driver.
- `lsh_topk` — the scale path: random-hyperplane LSH (seeded) buckets both corpus
  and queries; candidates are searched only within each query's bucket (plus
  optional multi-probe by flipping one hyperplane bit). Recall < 1 by design;
  the exact baseline is the oracle for recall tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.vectors import stack_list_column, topk_partials


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _merge_topk(
    partials: "ray.data.Dataset",
    k: int,
    exclude_self: bool,
    dedup_neighbors: bool,
) -> pd.DataFrame:
    """Distributed merge of per-block top-k partials → final (query_id,
    neighbor_id, rank) with rank 1..k, ties broken by neighbor id ascending.

    The reduce is a `groupby("query_id").map_groups` — BOUNDED (q groups, the
    CLAUDE.md map_groups rule): each group holds ≤ (k+1)·|blocks| candidate
    rows for ONE query and runs the same vectorized mergesort/head(k) that a
    driver-side merge would. The driver only ever receives the final q·k rows,
    so the merge is independent of block count (at 100 TB, ~10⁶ blocks ×
    q·(k+1) partial rows stay on the workers; the old `.to_pandas()` merge
    pulled them all to the driver)."""

    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        if dedup_neighbors:
            g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "neighbor_id", "rank"]]

    out = (
        partials.groupby("query_id")
        .map_groups(per_query, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype=np.int64),
                "neighbor_id": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64),
            }
        )
    return out.sort_values(["query_id", "rank"], ignore_index=True)


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank) with rank 1..k,
    ties broken by neighbor id ascending (deterministic)."""
    qmat = _unit(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qmat, np.asarray(query_ids)))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qids = ray.get(qref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mat = stack_list_column(t[vec_col])  # one flatten+reshape, no row loop
        sims = _unit(mat) @ qm.T  # (n, q)
        qid, nid, score = topk_partials(
            sims, ids, qids, k + (1 if exclude_self else 0)
        )
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "neighbor_id": pa.array(nid, pa.int64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(partials, k, exclude_self, dedup_neighbors=False)


def _kmeans(data: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic seeded k-means (numpy, Lloyd iterations) — the coarse
    quantizer for IVF. Run on a driver-side SAMPLE at scale (centroids are tiny)."""
    rng = np.random.default_rng(seed)
    centroids = data[rng.choice(len(data), size=min(k, len(data)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((data[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for ci in range(len(centroids)):
            sel = assign == ci
            if sel.any():
                centroids[ci] = data[sel].mean(axis=0)
    return centroids


def seeded_centroids(dim: int, k: int, seed: int = 42) -> np.ndarray:
    """Data-independent seeded Gaussian centroids (unit-normalized) — a coarse
    quantizer whose constants can be inlined into a SQL oracle (the ann_lsh
    hyperplane trick). k-means training (`_kmeans`) gives better lists on real
    distributions but its centroids depend on the corpus, which a static oracle
    string cannot replay across scale factors."""
    rng = np.random.default_rng(seed)
    return _unit(rng.standard_normal((k, dim)))


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_sample: int = 4096,
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k — the other scale path beside LSH:

    1. coarse quantizer: explicit ``centroids`` if given (e.g.
       `seeded_centroids` for SQL-replayable runs), else seeded k-means trained
       on a bounded driver-side sample;
    2. broadcast the centroid matrix; each batch assigns its vectors to their
       nearest centroid (one matmul) and searches only vectors whose centroid is
       among each query's ``nprobe`` closest lists;
    3. distributed per-query merge of the partial top-k (`_merge_topk`) —
       the driver only receives the final n_queries × k rows.

    Recall < 1 by construction; `brute_force_topk` is the exact oracle."""
    if centroids is None:
        sample = ds.limit(train_sample).to_arrow_refs()
        sample_t = pa.concat_tables([ray.get(r) for r in sample])
        train = _unit(stack_list_column(sample_t[vec_col]))
        centroids = _unit(_kmeans(train, num_centroids, seed=seed))
    else:
        centroids = _unit(np.asarray(centroids, dtype=np.float64))
    qmat = _unit(np.asarray(queries, dtype=np.float64))
    qc = (qmat @ centroids.T).argsort(axis=1)[:, ::-1][:, :nprobe]  # per-query probe lists
    wanted: dict[int, list[int]] = {}
    for qi in range(len(qmat)):
        for c in qc[qi]:
            wanted.setdefault(int(c), []).append(qi)
    ref = ray.put((qmat, np.asarray(query_ids), centroids, wanted))

    def local(t: pa.Table) -> pa.Table:
        qm, qids, cents, want = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mat = _unit(stack_list_column(t[vec_col]))
        assign = (mat @ cents.T).argmax(axis=1)
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for c in np.unique(assign):
            qis = want.get(int(c))
            if not qis:
                continue
            sel = assign == c
            sims = mat[sel] @ qm[qis].T
            parts.append(topk_partials(sims, ids[sel], np.asarray(qids)[qis], k + 1))
        qid = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        nid = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
        sco = np.concatenate([p[2] for p in parts]) if parts else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "neighbor_id": pa.array(nid, pa.int64()),
                "score": pa.array(sco, pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow")
    return _merge_topk(partials, k, exclude_self, dedup_neighbors=True)


def lsh_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane bucket per vector; each query searches
    only its bucket + one-bit-flip probes. Returns (query_id, neighbor_id, rank)."""
    qmat = _unit(np.asarray(queries, dtype=np.float64))
    d = dim or qmat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, num_planes))

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes) > 0
        return (bits * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)

    qbuckets = bucket_of(qmat)
    probe_sets = []
    for qb in qbuckets:
        probes = {int(qb)} | {int(qb) ^ (1 << b) for b in range(num_planes)}
        probe_sets.append(probes)
    wanted: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_sets):
        for b in probes:
            wanted.setdefault(b, []).append(qi)
    qref = ray.put((qmat, np.asarray(query_ids), wanted))

    def local(t: pa.Table) -> pa.Table:
        qm, qids, want = ray.get(qref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        unit = _unit(stack_list_column(t[vec_col]))
        buckets = bucket_of(unit)
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for b in np.unique(buckets):
            qis = want.get(int(b))
            if not qis:
                continue
            sel = buckets == b
            sims = unit[sel] @ qm[qis].T
            parts.append(topk_partials(sims, ids[sel], np.asarray(qids)[qis], k + 1))
        qid = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        nid = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
        sco = np.concatenate([p[2] for p in parts]) if parts else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "neighbor_id": pa.array(nid, pa.int64()),
                "score": pa.array(sco, pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow")
    return _merge_topk(partials, k, exclude_self, dedup_neighbors=True)


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Cluster assignment over an embedding corpus: broadcast unit centroids,
    one matmul + argmax per batch (ties → lowest cid, numpy argmax). The
    curation workhorse behind cluster-balanced sampling / semantic dedup —
    corpus streams, centroids are the only shared state. Assignment order is
    dot(raw_vector, unit_centroid), which is scale-invariant per row and
    replayable exactly by the DuckDB list_dot_product oracle (same trick as
    `ivf_topk`'s oracle)."""
    cents = _unit(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = stack_list_column(t[vec_col]).astype(np.float64)
        a = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({id_col: t[id_col], "cluster": pa.array(a, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Semantic dedup, SemDeDup-shaped (Abbas et al. 2023): k-means-bucket the
    corpus, compare cosine only WITHIN a cluster, and drop every vector that
    has ANY lower-id in-cluster neighbor at/above the threshold (deterministic,
    non-cascading — a dropped vector still shadows later ones, which is exactly
    the SQL ``NOT EXISTS earlier neighbor`` predicate the oracle replays).

    This is the SCALE PATH the exact all-pairs baseline
    (`dedup_docs.embedding_neardup_pairs`) is not: pairwise work happens only
    inside a cluster, and the cluster count is the partitioning knob — k grows
    with the corpus so |cluster| stays bounded (documented assumption; skewed
    clusters bound the largest single task). One exchange ships each
    (id, cluster, vector) once; the driver never sees a row."""
    cents = _unit(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = stack_list_column(t[vec_col]).astype(np.float64)
        a = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "cluster": pa.array(a, pa.int64()),
            }
        )

    def per_cluster(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        mat = stack_list_column(t[vec_col]).astype(np.float64)[order]
        ids = ids[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T  # bounded: |cluster|² by design
        m = sim >= threshold
        drop = np.triu(m, 1).any(axis=0)  # exists earlier (lower-id) neighbor
        keep = ~drop
        cl = t["cluster"].to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "cluster": pa.array(cl[keep], pa.int64()),
            }
        )

    ex = ds.map_batches(assign, batch_format="pyarrow")
    return ex.groupby("cluster").map_groups(per_cluster, batch_format="pyarrow")
