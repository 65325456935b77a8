"""Driver-contract queries, wave 237 — cluster-validity indices over the
labeled embeddings (Calinski-Harabasz 1974 and the centroid-form
Davies-Bouldin 1979, both closed-form from per-label moment folds) and a
deterministic DBSCAN (Ester et al. 1996) baseline over the first-200
vector sample with an integer-quantized distance contract.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES237: dict[str, str] = {}

_DB_SAMPLE = 200  # DBSCAN small-N baseline scope (like _AU_SAMPLE)
_DB_MINPTS = 5  # neighbors within eps, self included


# ---------------------------------------------------------------------------
# emb_cluster_validity — CH and DB indices from per-label moments
# ---------------------------------------------------------------------------


def q_emb_cluster_validity(sf_dir: str):
    """One row of cluster-validity indices for the label partition:
    Calinski-Harabasz CH = (B/(k−1))/(W/(n−k)) and the centroid-form
    Davies-Bouldin DB = (1/k)·Σ_i max_{j≠i} (s_i+s_j)/‖μ_i−μ_j‖ with
    s_c = √(W_c/n_c), where B/W come from per-label first/second moments
    (labels with < 2 vectors drop from both). Output: k, n, ch_micro,
    db_micro.

    Scale shape: per-batch (label, dim) moment partials — the driver folds
    a |labels|×dims table and the k² centroid-pair scan; vectors never
    leave their batch."""
    path = f"{sf_dir}/embeddings.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // max(len(lab), 1)
        mat = flat.reshape(len(lab), d)
        out = []
        for c in np.unique(lab):
            sub = mat[lab == c]
            dims = np.arange(d, dtype=np.int64)
            out.append(
                pd.DataFrame(
                    {"label": np.int64(c),
                     "dim": np.concatenate([dims, [np.int64(-1), np.int64(-2)]]),
                     "v": np.concatenate(
                         [sub.sum(axis=0),
                          [np.float64(len(sub)), (sub * sub).sum()]]
                     )}
                )
            )
        return pd.concat(out, ignore_index=True)

    part = (
        ray.data.read_parquet(path, columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["k", "n", "ch_micro", "db_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    fold = part.groupby(["label", "dim"])["v"].sum().unstack("dim")
    n_c = fold[-1].to_numpy(np.float64)
    ssq_c = fold[-2].to_numpy(np.float64)
    s_c = fold[[c for c in fold.columns if c >= 0]].to_numpy(np.float64)
    keep = n_c >= 2.0
    n_c, ssq_c, s_c = n_c[keep], ssq_c[keep], s_c[keep]
    k = len(n_c)
    n = float(n_c.sum())
    if k < 2 or n <= k:
        return empty
    mu = s_c / n_c[:, None]
    gmu = s_c.sum(axis=0) / n
    w_c = ssq_c - n_c * (mu * mu).sum(axis=1)
    w = float(w_c.sum())
    b = float((n_c * ((mu - gmu) ** 2).sum(axis=1)).sum())
    ch = (b / (k - 1)) / (w / (n - k))
    sig = np.sqrt(w_c / n_c)
    dist = np.sqrt(((mu[:, None, :] - mu[None, :, :]) ** 2).sum(axis=2))
    ratio = (sig[:, None] + sig[None, :]) / np.where(dist > 0.0, dist, np.inf)
    np.fill_diagonal(ratio, -np.inf)
    db = float(ratio.max(axis=1).mean())
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {"k": [np.int64(k)], "n": [np.int64(n)],
         "ch_micro": [micro(ch)], "db_micro": [micro(db)]}
    )


ORACLES237["emb_cluster_validity"] = """
WITH e AS (
  SELECT label, vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
),
lc AS (
  SELECT label, CAST(count(*) AS DOUBLE) AS n FROM embeddings
  GROUP BY 1 HAVING count(*) >= 2
),
sd AS (
  SELECT e.label, e.dim, sum(CAST(e.x AS DOUBLE)) AS s
  FROM e JOIN lc ON e.label = lc.label GROUP BY 1, 2
),
qq AS (
  SELECT e.label, sum(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE)) AS ssq
  FROM e JOIN lc ON e.label = lc.label GROUP BY 1
),
mu AS (
  SELECT sd.label, sd.dim, sd.s / lc.n AS m
  FROM sd JOIN lc ON sd.label = lc.label
),
tot AS (SELECT sum(n) AS n FROM lc),
gmu AS (SELECT dim, sum(s) / tot.n AS g FROM sd, tot GROUP BY dim, tot.n),
mm AS (SELECT label, sum(m * m) AS m2 FROM mu GROUP BY 1),
wc AS (
  SELECT qq.label, qq.ssq - lc.n * mm.m2 AS w, lc.n
  FROM qq JOIN lc ON qq.label = lc.label JOIN mm ON qq.label = mm.label
),
bterm AS (
  SELECT mu.label, sum((mu.m - gmu.g) * (mu.m - gmu.g)) AS d2
  FROM mu JOIN gmu ON mu.dim = gmu.dim GROUP BY 1
),
scal AS (
  SELECT CAST(count(*) AS DOUBLE) AS k, sum(wc.n) AS n, sum(wc.w) AS w,
         sum(wc.n * bterm.d2) AS b
  FROM wc JOIN bterm ON wc.label = bterm.label
),
sig AS (SELECT label, sqrt(w / n) AS s FROM wc),
cd AS (
  SELECT a.label AS i, b.label AS j,
         sqrt(sum((ma.m - mb.m) * (ma.m - mb.m))) AS d
  FROM lc a JOIN lc b ON a.label <> b.label
  JOIN mu ma ON ma.label = a.label
  JOIN mu mb ON mb.label = b.label AND ma.dim = mb.dim
  GROUP BY 1, 2
),
ri AS (
  SELECT cd.i, max((sa.s + sb.s) / cd.d) AS r
  FROM cd JOIN sig sa ON sa.label = cd.i JOIN sig sb ON sb.label = cd.j
  WHERE cd.d > 0.0 GROUP BY 1
),
db AS (SELECT avg(r) AS db FROM ri)
SELECT CAST(scal.k AS BIGINT) AS k, CAST(scal.n AS BIGINT) AS n,
       CAST(floor((scal.b / (scal.k - 1.0)) / (scal.w / (scal.n - scal.k))
                  * 1000000.0 + 0.5) AS BIGINT) AS ch_micro,
       CAST(floor(db.db * 1000000.0 + 0.5) AS BIGINT) AS db_micro
FROM scal, db WHERE scal.k >= 2 AND scal.n > scal.k"""


# ---------------------------------------------------------------------------
# emb_dbscan — deterministic DBSCAN over the first-200 sample
# ---------------------------------------------------------------------------


def q_emb_dbscan(sf_dir: str):
    """DBSCAN over the first 200 vectors by vec_id (documented small-N
    baseline scope) under the INTEGER-quantized squared distance
    d2q = ⌊‖a−b‖²·10⁶ + 0.5⌋ (engine-stable comparisons): eps² = the
    100th-smallest 4-NN d2q, minPts = 5 with self; clusters = connected
    components of core points, labeled by their MIN core vec_id; border
    points join the min-labeled core neighbor; the rest is noise. Output:
    one row per cluster — cluster_rep, n_core, n_border, n_noise (const).

    Scale shape: the labeled O(200²) baseline, same scope contract as
    emb_alignment_uniformity; the scale path is the bucketed near-dup
    clustering family (stages/clusters.py)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), np.int64)
    emb = t["embedding"]
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // max(len(ids), 1)
    mat = flat.reshape(len(ids), d)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cols = ["cluster_rep", "n_core", "n_border", "n_noise"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(ids) < _DB_SAMPLE:
        return empty
    ids, mat = ids[:_DB_SAMPLE], mat[:_DB_SAMPLE]
    m = _DB_SAMPLE
    diff = mat[:, None, :] - mat[None, :, :]
    d2q = np.floor((diff * diff).sum(axis=2) * 1_000_000.0 + 0.5).astype(
        np.int64
    )
    # 4th NN with self included = 5th smallest per row
    knn4 = np.sort(d2q, axis=1)[:, _DB_MINPTS - 1]
    eps = np.int64(np.sort(knn4)[m // 2 - 1])  # the 100th smallest
    within = d2q <= eps
    core = within.sum(axis=1) >= _DB_MINPTS
    # min-label propagation over the core-core eps graph
    lab = np.where(core, ids, np.int64(np.iinfo(np.int64).max))
    adj = within & core[:, None] & core[None, :]
    while True:
        new = lab.copy()
        for i in np.flatnonzero(core):
            new[i] = lab[adj[i]].min()
        if (new == lab).all():
            break
        lab = new
    rows = []
    border_lab = np.full(m, np.int64(-1))
    for i in np.flatnonzero(~core):
        nb = within[i] & core
        if nb.any():
            border_lab[i] = lab[nb].min()
    n_noise = int(((~core) & (border_lab < 0)).sum())
    reps = np.unique(lab[core])
    for r in reps:
        rows.append(
            (np.int64(r), np.int64((lab[core] == r).sum()),
             np.int64((border_lab == r).sum()), np.int64(n_noise))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).sort_values(
        "cluster_rep", kind="mergesort"
    ).reset_index(drop=True)


ORACLES237["emb_dbscan"] = f"""
WITH RECURSIVE samp AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id
  LIMIT {_DB_SAMPLE}
),
d AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         CAST(floor(list_sum(list_transform(range(1, len(a.embedding) + 1),
           k -> (CAST(a.embedding[k] AS DOUBLE) - CAST(b.embedding[k] AS DOUBLE))
              * (CAST(a.embedding[k] AS DOUBLE)
                 - CAST(b.embedding[k] AS DOUBLE))))
           * 1000000.0 + 0.5) AS BIGINT) AS d2q
  FROM samp a, samp b
),
knn AS (
  SELECT i, d2q FROM (
    SELECT i, d2q, row_number() OVER (PARTITION BY i ORDER BY d2q, j) AS rn
    FROM d
  ) WHERE rn = {_DB_MINPTS}
),
eps AS (
  SELECT d2q AS e FROM (
    SELECT d2q, row_number() OVER (ORDER BY d2q, i) AS rn FROM knn
  ) WHERE rn = {_DB_SAMPLE} // 2
),
deg AS (
  SELECT d.i, count(*) AS c FROM d, eps WHERE d.d2q <= eps.e GROUP BY 1
),
core AS (SELECT i FROM deg WHERE c >= {_DB_MINPTS}),
cedge AS (
  SELECT d.i, d.j FROM d, eps
  WHERE d.d2q <= eps.e
    AND d.i IN (SELECT i FROM core) AND d.j IN (SELECT i FROM core)
),
reach AS (
  SELECT i, i AS lab FROM core
  UNION
  SELECT e.i, r.lab FROM cedge e JOIN reach r ON r.i = e.j
),
comp AS (SELECT i, min(lab) AS lab FROM reach GROUP BY 1),
border AS (
  SELECT d.i, min(comp.lab) AS lab
  FROM d JOIN comp ON comp.i = d.j, eps
  WHERE d.d2q <= eps.e AND d.i NOT IN (SELECT i FROM core)
  GROUP BY d.i
),
noise AS (
  SELECT count(*) AS n FROM samp
  WHERE vec_id NOT IN (SELECT i FROM comp)
    AND vec_id NOT IN (SELECT i FROM border)
)
SELECT comp.lab AS cluster_rep,
       CAST(count(*) AS BIGINT) AS n_core,
       CAST(coalesce(any_value(b.nb), 0) AS BIGINT) AS n_border,
       CAST(any_value(noise.n) AS BIGINT) AS n_noise
FROM comp
LEFT JOIN (SELECT lab, count(*) AS nb FROM border GROUP BY 1) b
  ON b.lab = comp.lab, noise
GROUP BY comp.lab ORDER BY comp.lab"""


QUERIES237 = {
    "emb_cluster_validity": q_emb_cluster_validity,
    "emb_dbscan": q_emb_dbscan,
}
