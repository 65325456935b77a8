"""Driver-contract queries, wave 227 — polynomial-kernel Maximum Mean
Discrepancy between embedding classes 0 and 1 (closed form via class moment
matrices; Gretton et al. 2012 biased V-statistic) and lexicon polarity
scoring per document source.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES227: dict[str, str] = {}

_POS = ("fast", "big")
_NEG = ("slow", "error", "dup")


# ---------------------------------------------------------------------------
# emb_mmd_poly — closed-form degree-2 polynomial-kernel MMD
# ---------------------------------------------------------------------------


def q_emb_mmd_poly(sf_dir: str):
    """MMD² between embedding classes 0 and 1 under k(x,y) = (⟨x,y⟩+1)²
    (biased V-statistic): with class mean μ and second moment S = E[xxᵀ],
    E[k] between classes P,Q = ⟨S_P,S_Q⟩_F + 2⟨μ_P,μ_Q⟩ + 1, so MMD² =
    k_PP + k_QQ − 2k_PQ in closed form. One row: n0, n1, mmd2_micro.

    Scale shape: one per-batch per-class (Σx, Σxxᵀ) moment combiner
    (zero-copy FixedSizeList matmul); the Frobenius algebra on the
    driver."""
    path = f"{sf_dir}/embeddings.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
        keep = (lab == 0) | (lab == 1)
        if not keep.any():
            return pd.DataFrame({"label": pd.Series([], dtype=np.int64)})
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // len(lab)
        mat = flat.reshape(len(lab), d)[keep]
        lab = lab[keep]
        outs = []
        for c in (0, 1):
            sub = mat[lab == c]
            if len(sub) == 0:
                continue
            g = (sub.T @ sub).reshape(-1)
            s = sub.sum(axis=0)
            row = {"label": np.int64(c), "n": np.int64(len(sub))}
            row.update({f"s{i}": s[i] for i in range(d)})
            row.update({f"g{i}": g[i] for i in range(d * d)})
            outs.append(row)
        return pd.DataFrame(outs)

    part = (
        ray.data.read_parquet(path, columns=["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n0", "n1", "mmd2_micro"]
    if part.empty or "n" not in part.columns:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    agg = part.groupby("label").sum()
    if 0 not in agg.index or 1 not in agg.index:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    d = int(np.sqrt(sum(1 for c in part.columns if c.startswith("g"))))
    stats = {}
    for c in (0, 1):
        n = float(agg.loc[c, "n"])
        mu = np.array([agg.loc[c, f"s{i}"] for i in range(d)]) / n
        ss = np.array([agg.loc[c, f"g{i}"] for i in range(d * d)]).reshape(d, d) / n
        stats[c] = (n, mu, ss)

    def kk(a, b):
        _, mua, sa = stats[a]
        _, mub, sb = stats[b]
        return (sa * sb).sum() + 2.0 * (mua * mub).sum() + 1.0

    mmd2 = kk(0, 0) + kk(1, 1) - 2.0 * kk(0, 1)
    return pd.DataFrame(
        {
            "n0": [np.int64(stats[0][0])],
            "n1": [np.int64(stats[1][0])],
            "mmd2_micro": [np.int64(np.floor(mmd2 * 1_000_000.0 + 0.5))],
        }
    )


ORACLES227["emb_mmd_poly"] = """
WITH e AS (
  SELECT label, vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings WHERE label IN (0, 1)
),
cnt AS (SELECT label, CAST(count(*) AS DOUBLE) AS n
        FROM embeddings WHERE label IN (0, 1) GROUP BY 1),
mu AS (
  SELECT e.label, e.dim, sum(CAST(e.x AS DOUBLE)) / cnt.n AS m
  FROM e JOIN cnt ON e.label = cnt.label GROUP BY 1, 2, cnt.n
),
sm AS (
  SELECT a.label, a.dim AS di, b.dim AS dj,
         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS g
  FROM e a JOIN e b ON a.vec_id = b.vec_id
  GROUP BY 1, 2, 3
),
sn AS (
  SELECT sm.label, sm.di, sm.dj, sm.g / cnt.n AS s
  FROM sm JOIN cnt ON sm.label = cnt.label
),
kss AS (
  SELECT a.label AS la, b.label AS lb, sum(a.s * b.s) AS fro
  FROM sn a JOIN sn b ON a.di = b.di AND a.dj = b.dj
  GROUP BY 1, 2
),
kmu AS (
  SELECT a.label AS la, b.label AS lb, sum(a.m * b.m) AS dot
  FROM mu a JOIN mu b ON a.dim = b.dim
  GROUP BY 1, 2
),
kmat AS (
  SELECT kss.la, kss.lb, kss.fro + 2.0 * kmu.dot + 1.0 AS k
  FROM kss JOIN kmu ON kss.la = kmu.la AND kss.lb = kmu.lb
)
SELECT CAST((SELECT n FROM cnt WHERE label = 0) AS BIGINT) AS n0,
       CAST((SELECT n FROM cnt WHERE label = 1) AS BIGINT) AS n1,
       CAST(floor(((SELECT k FROM kmat WHERE la = 0 AND lb = 0)
                   + (SELECT k FROM kmat WHERE la = 1 AND lb = 1)
                   - 2.0 * (SELECT k FROM kmat WHERE la = 0 AND lb = 1))
                  * 1000000.0 + 0.5) AS BIGINT) AS mmd2_micro"""


# ---------------------------------------------------------------------------
# docs_lexicon_polarity — lexicon sentiment per source
# ---------------------------------------------------------------------------


def q_docs_lexicon_polarity(sf_dir: str):
    """Per source: lexicon polarity over token occurrences — positive =
    {fast, big}, negative = {slow, error, dup}; polarity = (pos−neg)/
    (pos+neg) (sources with no lexicon hits drop). Output: source, n_pos,
    n_neg, polarity_micro.

    Scale shape: one bounded (source, pos, neg) combiner — no shuffle."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), object), counts
        )
        pos = np.isin(flat, _POS).astype(np.int64)
        neg = np.isin(flat, _NEG).astype(np.int64)
        df = pd.DataFrame({"source": src, "pos": pos, "neg": neg})
        return df.groupby("source", sort=False, as_index=False)[["pos", "neg"]].sum()

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_pos", "n_neg", "polarity_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    g = part.groupby("source")[["pos", "neg"]].sum().sort_index()
    g = g[(g["pos"] + g["neg"]) > 0]
    pol = (g["pos"] - g["neg"]).to_numpy(np.float64) / (
        g["pos"] + g["neg"]
    ).to_numpy(np.float64)
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_pos": g["pos"].to_numpy(np.int64),
            "n_neg": g["neg"].to_numpy(np.int64),
            "polarity_micro": np.floor(pol * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )


_POS_SQL = "('" + "', '".join(_POS) + "')"
_NEG_SQL = "('" + "', '".join(_NEG) + "')"

ORACLES227["docs_lexicon_polarity"] = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
g AS (
  SELECT source,
         CAST(sum(CASE WHEN w IN {_POS_SQL} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(sum(CASE WHEN w IN {_NEG_SQL} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg
  FROM tok GROUP BY 1
)
SELECT source, n_pos, n_neg,
       CAST(floor(CAST(n_pos - n_neg AS DOUBLE)
                  / CAST(n_pos + n_neg AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS polarity_micro
FROM g WHERE n_pos + n_neg > 0 ORDER BY source"""


QUERIES227 = {
    "emb_mmd_poly": q_emb_mmd_poly,
    "docs_lexicon_polarity": q_docs_lexicon_polarity,
}
