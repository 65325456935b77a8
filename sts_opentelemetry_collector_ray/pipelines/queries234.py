"""Driver-contract queries, wave 234 — intra-document topical coherence
(cosine between the bag-of-words of the first and second half of each doc,
averaged per source) and the Wang-Isola (2020) alignment/uniformity metrics
over embeddings (alignment closed-form from class moments; uniformity on
the documented 200-vector baseline scope).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES234: dict[str, str] = {}

_AU_SAMPLE = 200


# ---------------------------------------------------------------------------
# docs_halves_coherence — first-half vs second-half cosine per doc
# ---------------------------------------------------------------------------


def q_docs_halves_coherence(sf_dir: str):
    """Per source: mean cosine similarity between the word-count vectors of
    each document's first and second token half (position < ⌊n/2⌋ vs the
    rest; docs with an empty half drop). Output: source, n_docs,
    coherence_micro.

    Scale shape: halves split inside each batch (a doc lives in one row);
    one bounded (source, n, Σcos) combiner folds on the driver."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        first = np.repeat(off[:-1], counts)
        keep = flat != ""
        df = pd.DataFrame({"di": di[keep], "w": flat[keep]})
        df["pos"] = df.groupby("di").cumcount()
        ntok = df.groupby("di")["w"].size()
        half = (ntok // 2).reindex(df["di"].to_numpy()).to_numpy()
        df["h"] = (df["pos"].to_numpy() >= half).astype(np.int64)
        cnt = df.groupby(["di", "h", "w"]).size().rename("c").reset_index()
        piv = cnt.pivot_table(
            index=["di", "w"], columns="h", values="c", fill_value=0,
            aggfunc="sum",
        )
        for hcol in (0, 1):
            if hcol not in piv.columns:
                piv[hcol] = 0
        dots = (piv[0] * piv[1]).groupby(level=0).sum()
        n0 = (piv[0] * piv[0]).groupby(level=0).sum()
        n1 = (piv[1] * piv[1]).groupby(level=0).sum()
        ok = (n0 > 0) & (n1 > 0)
        if not ok.any():
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "n_docs": pd.Series([], dtype=np.int64),
                 "cos_sum": pd.Series([], dtype=np.float64)}
            )
        cos = dots[ok].to_numpy(np.float64) / (
            np.sqrt(n0[ok].to_numpy(np.float64))
            * np.sqrt(n1[ok].to_numpy(np.float64))
        )
        src_all = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        srcs = src_all[ok[ok].index.to_numpy(np.int64)]
        out = pd.DataFrame({"source": srcs, "n_docs": 1, "cos_sum": cos})
        return out.groupby("source", sort=False, as_index=False).sum().astype(
            {"n_docs": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_docs", "coherence_micro"]
    if part.empty:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=object),
             "n_docs": pd.Series([], dtype=np.int64),
             "coherence_micro": pd.Series([], dtype=np.int64)}
        )
    g = part.groupby("source")[["n_docs", "cos_sum"]].sum().sort_index()
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_docs": g["n_docs"].to_numpy(np.int64),
            "coherence_micro": np.floor(
                g["cos_sum"].to_numpy(np.float64)
                / g["n_docs"].to_numpy(np.float64)
                * 1_000_000.0
                + 0.5
            ).astype(np.int64),
        }
    )


ORACLES234["docs_halves_coherence"] = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
tok AS (
  SELECT doc_id, source, unnest(ws) AS t,
         unnest(range(1, len(ws) + 1)) AS p
  FROM w
),
t2 AS (
  SELECT doc_id, source, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS pos,
         count(*) OVER (PARTITION BY doc_id) AS ntok
  FROM tok WHERE t <> ''
),
cnt AS (
  SELECT doc_id, source, t,
         CASE WHEN pos >= ntok // 2 THEN 1 ELSE 0 END AS h,
         count(*) AS c
  FROM t2 GROUP BY 1, 2, 3, 4
),
piv AS (
  SELECT doc_id, source, t,
         sum(CASE WHEN h = 0 THEN c ELSE 0 END) AS c0,
         sum(CASE WHEN h = 1 THEN c ELSE 0 END) AS c1
  FROM cnt GROUP BY 1, 2, 3
),
per AS (
  SELECT doc_id, source,
         sum(CAST(c0 * c1 AS DOUBLE)) AS dot,
         sum(CAST(c0 * c0 AS DOUBLE)) AS n0,
         sum(CAST(c1 * c1 AS DOUBLE)) AS n1
  FROM piv GROUP BY 1, 2
),
cosd AS (
  SELECT source, dot / (sqrt(n0) * sqrt(n1)) AS cs
  FROM per WHERE n0 > 0.0 AND n1 > 0.0
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(floor(sum(cs) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS coherence_micro
FROM cosd GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# emb_alignment_uniformity — Wang-Isola representation metrics
# ---------------------------------------------------------------------------


def q_emb_alignment_uniformity(sf_dir: str):
    """Wang & Isola (2020) metrics: ALIGNMENT = mean over labels of
    E‖x−x'‖² between independent same-label vectors = 2(tr(S_c)−‖μ_c‖²)
    (closed form from per-label moments, label-count-weighted mean);
    UNIFORMITY = ln(mean over ordered pairs i≠j of exp(−2‖x_i−x_j‖²))
    over the FIRST 200 vectors (documented small-N baseline). One row:
    n, alignment_micro, uniformity_micro.

    Scale shape: alignment folds per-label (n, Σx, Σ‖x‖²) moments;
    uniformity is the labeled O(200²) baseline."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), np.int64)
    lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
    emb = t["embedding"]
    emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // len(ids)
    mat = flat.reshape(len(ids), d)
    order = np.argsort(ids)
    ids, lab, mat = ids[order], lab[order], mat[order]
    cols = ["n", "alignment_micro", "uniformity_micro"]
    if len(ids) < _AU_SAMPLE + 1:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    # alignment: label-count-weighted mean of 2(tr(S_c) - ||mu_c||^2)
    num = 0.0
    den = 0.0
    for c in np.unique(lab):
        sub = mat[lab == c]
        nc = float(len(sub))
        if nc < 2:
            continue
        mu = sub.sum(axis=0) / nc
        tr_s = (sub * sub).sum() / nc
        num += nc * 2.0 * (tr_s - (mu * mu).sum())
        den += nc
    align = num / den if den > 0.0 else 0.0
    # uniformity over the first 200 vectors
    s = mat[:_AU_SAMPLE]
    g = s @ s.T
    sq = np.diag(g)
    d2 = sq[:, None] + sq[None, :] - 2.0 * g
    iu = ~np.eye(_AU_SAMPLE, dtype=bool)
    unif = float(np.log(np.exp(-2.0 * d2[iu]).mean()))
    return pd.DataFrame(
        {
            "n": [np.int64(len(ids))],
            "alignment_micro": [np.int64(np.floor(align * 1_000_000.0 + 0.5))],
            "uniformity_micro": [np.int64(np.floor(unif * 1_000_000.0 + 0.5))],
        }
    )


ORACLES234["emb_alignment_uniformity"] = f"""
WITH e AS (
  SELECT label, vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
),
lc AS (SELECT label, CAST(count(*) AS DOUBLE) AS n FROM embeddings GROUP BY 1),
mu AS (
  SELECT e.label, e.dim, sum(CAST(e.x AS DOUBLE)) / lc.n AS m
  FROM e JOIN lc ON e.label = lc.label GROUP BY 1, 2, lc.n
),
trs AS (
  SELECT e.label, sum(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE)) / lc.n AS tr
  FROM e JOIN lc ON e.label = lc.label GROUP BY 1, lc.n
),
mn AS (SELECT label, sum(m * m) AS mm FROM mu GROUP BY 1),
al AS (
  SELECT sum(lc.n * 2.0 * (trs.tr - mn.mm)) / sum(lc.n) AS align
  FROM lc JOIN trs ON lc.label = trs.label JOIN mn ON lc.label = mn.label
  WHERE lc.n >= 2
),
samp AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_AU_SAMPLE}
),
pd2 AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         list_sum(list_transform(range(1, len(a.embedding) + 1),
           k -> (CAST(a.embedding[k] AS DOUBLE) - CAST(b.embedding[k] AS DOUBLE))
                * (CAST(a.embedding[k] AS DOUBLE)
                   - CAST(b.embedding[k] AS DOUBLE)))) AS d2
  FROM samp a JOIN samp b ON a.vec_id <> b.vec_id
),
un AS (SELECT ln(sum(exp(-2.0 * d2)) / count(*)) AS unif FROM pd2)
SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n,
       CAST(floor(al.align * 1000000.0 + 0.5) AS BIGINT) AS alignment_micro,
       CAST(floor(un.unif * 1000000.0 + 0.5) AS BIGINT) AS uniformity_micro
FROM al, un"""


QUERIES234 = {
    "docs_halves_coherence": q_docs_halves_coherence,
    "emb_alignment_uniformity": q_emb_alignment_uniformity,
}
