"""Driver-contract queries, wave 226 — Cohen's kappa agreement between two
document quality filters (length-above-median vs stopword-ratio-below-
median) and linear Centered Kernel Alignment between the two halves of the
embedding space (representation-similarity audit, Kornblith et al. 2019).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES226: dict[str, str] = {}

_STOPS = ("the", "a")


# ---------------------------------------------------------------------------
# docs_filter_kappa — agreement between two quality filters
# ---------------------------------------------------------------------------


def q_docs_filter_kappa(sf_dir: str):
    """Cohen's kappa (1960) between filter A = token count ≥ corpus lower
    median and filter B = stopword ratio ≤ corpus lower median: the 2×2
    agreement table, observed agreement p_o, chance agreement p_e and
    κ = (p_o−p_e)/(1−p_e). One row: n, n11, n00, n10, n01, kappa_micro.

    Scale shape: one per-doc (tokens, stop ratio) combiner pass; medians
    are order statistics over the folded per-doc table (docs scale ⇒ the
    distributed order-stat exchange); the 2×2 algebra on the driver."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        nonempty = flat != ""
        ntok = np.bincount(di[nonempty], minlength=len(counts)).astype(np.int64)
        stop = np.isin(flat, _STOPS)
        nstop = np.bincount(di[stop], minlength=len(counts)).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64),
             "ntok": ntok, "nstop": nstop}
        )

    per = (
        ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "n11", "n00", "n10", "n01", "kappa_micro"]
    per = per[per["ntok"] > 0]
    if per.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    ratio = per["nstop"].to_numpy(np.float64) / per["ntok"].to_numpy(np.float64)
    ntok = per["ntok"].to_numpy(np.int64)
    n = len(per)
    med_tok = np.sort(ntok)[(n + 1) // 2 - 1]
    med_ratio = np.sort(ratio)[(n + 1) // 2 - 1]
    a = ntok >= med_tok
    b = ratio <= med_ratio
    n11 = int((a & b).sum())
    n00 = int((~a & ~b).sum())
    n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum())
    po = (n11 + n00) / float(n)
    pa_ = ((n11 + n10) / float(n)) * ((n11 + n01) / float(n)) + (
        (n01 + n00) / float(n)
    ) * ((n10 + n00) / float(n))
    kappa = (po - pa_) / (1.0 - pa_) if pa_ < 1.0 else 0.0
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "n11": [np.int64(n11)],
            "n00": [np.int64(n00)],
            "n10": [np.int64(n10)],
            "n01": [np.int64(n01)],
            "kappa_micro": [np.int64(np.floor(kappa * 1_000_000.0 + 0.5))],
        }
    )


ORACLES226["docs_filter_kappa"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) AS BIGINT) AS ntok,
         CAST(sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT)
           AS nstop
  FROM tok GROUP BY 1 HAVING sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) > 0
),
mt AS (
  SELECT ntok AS m FROM (
    SELECT ntok, row_number() OVER (ORDER BY ntok) AS r,
           count(*) OVER () AS n
    FROM per
  ) WHERE r = (n + 1) // 2
),
mr AS (
  SELECT ratio AS m FROM (
    SELECT CAST(nstop AS DOUBLE) / ntok AS ratio,
           row_number() OVER (ORDER BY CAST(nstop AS DOUBLE) / ntok) AS r,
           count(*) OVER () AS n
    FROM per
  ) WHERE r = (n + 1) // 2
),
flags AS (
  SELECT CASE WHEN per.ntok >= mt.m THEN 1 ELSE 0 END AS a,
         CASE WHEN CAST(per.nstop AS DOUBLE) / per.ntok <= mr.m
              THEN 1 ELSE 0 END AS b
  FROM per, mt, mr
),
t2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * b) AS BIGINT) AS n11,
         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01
  FROM flags
),
k AS (
  SELECT n, n11, n00, n10, n01,
         (CAST(n11 + n00 AS DOUBLE) / n) AS po,
         (CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
         + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n)
           AS pe
  FROM t2
)
SELECT n, n11, n00, n10, n01,
       CAST(floor((CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe)
                        ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)
         AS kappa_micro
FROM k"""


# ---------------------------------------------------------------------------
# emb_cka_halves — linear CKA between embedding halves
# ---------------------------------------------------------------------------


def q_emb_cka_halves(sf_dir: str):
    """Linear CKA (Kornblith et al. 2019) between the first and second 32
    dimensions of the embedding space: with column-centered X, Y,
    CKA = ‖XᵀY‖²_F / (‖XᵀX‖_F · ‖YᵀY‖_F). One row: n, cka_micro.

    Scale shape: per-batch 64×64 moment-matrix combiner (zero-copy
    FixedSizeList matmul); the Frobenius norms evaluate on the driver."""
    path = f"{sf_dir}/embeddings.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        nrow = len(t)
        d = len(flat) // nrow
        mat = flat.reshape(nrow, d)
        g = mat.T @ mat  # d×d second moments
        s = mat.sum(axis=0)
        out = {"n": [np.int64(nrow)]}
        out.update({f"s{i}": [s[i]] for i in range(d)})
        # flatten the Gram matrix row-major
        gi = g.reshape(-1)
        out.update({f"g{i}": [gi[i]] for i in range(d * d)})
        return pd.DataFrame(out)

    part = (
        ray.data.read_parquet(path, columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "cka_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    tot = part.sum()
    n = float(tot["n"])
    d = int(np.sqrt(sum(1 for c in part.columns if c.startswith("g"))))
    s = np.array([tot[f"s{i}"] for i in range(d)], np.float64)
    g = np.array([tot[f"g{i}"] for i in range(d * d)], np.float64).reshape(d, d)
    c = g - np.outer(s, s) / n  # centered cross-moment matrix
    h = d // 2
    m_xy = c[:h, h:]
    m_xx = c[:h, :h]
    m_yy = c[h:, h:]
    num = (m_xy * m_xy).sum()
    den = np.sqrt((m_xx * m_xx).sum()) * np.sqrt((m_yy * m_yy).sum())
    cka = num / den if den > 0.0 else 0.0
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "cka_micro": [np.int64(np.floor(cka * 1_000_000.0 + 0.5))],
        }
    )


ORACLES226["emb_cka_halves"] = """
WITH e AS (
  SELECT unnest(embedding) AS x, unnest(range(0, len(embedding))) AS dim,
         vec_id
  FROM embeddings
),
cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
p AS (
  SELECT a.dim AS di, b.dim AS dj,
         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS g
  FROM e a JOIN e b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
m AS (SELECT dim, sum(CAST(x AS DOUBLE)) AS s FROM e GROUP BY 1),
c AS (
  SELECT p.di, p.dj, p.g - ma.s * mb.s / cnt.n AS v
  FROM p JOIN m ma ON p.di = ma.dim JOIN m mb ON p.dj = mb.dim, cnt
),
f AS (
  SELECT sum(CASE WHEN di < 32 AND dj >= 32 THEN v * v ELSE 0.0 END) AS num,
         sum(CASE WHEN di < 32 AND dj < 32 THEN v * v ELSE 0.0 END) AS nxx,
         sum(CASE WHEN di >= 32 AND dj >= 32 THEN v * v ELSE 0.0 END) AS nyy
  FROM c
)
SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n,
       CAST(floor((CASE WHEN sqrt(nxx) * sqrt(nyy) > 0.0
                        THEN num / (sqrt(nxx) * sqrt(nyy)) ELSE 0.0 END)
                  * 1000000.0 + 0.5) AS BIGINT) AS cka_micro
FROM f"""


QUERIES226 = {
    "docs_filter_kappa": q_docs_filter_kappa,
    "emb_cka_halves": q_emb_cka_halves,
}
