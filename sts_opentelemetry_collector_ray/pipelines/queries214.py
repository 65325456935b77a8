"""Driver-contract queries, wave 214 — LLM watermark greenlist detection
(Kirchenbauer et al. 2023 style z-test over hash-seeded green bigrams) and
diagonal Fisher LDA between embedding classes 0 and 1 (per-dimension
discriminability). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES214: dict[str, str] = {}

_FNV64_BASIS = 14695981039346656037


def _fnv64_sql(expr: str) -> str:
    return f"""CASE WHEN {expr} = '' THEN CAST({_FNV64_BASIS} AS HUGEINT)
ELSE CAST(list_reduce(list_prepend(CAST({_FNV64_BASIS} AS HUGEINT),
  list_transform(string_split({expr}, ''), c -> unicode(c)::HUGEINT)),
  (acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS HUGEINT) END"""


# ---------------------------------------------------------------------------
# docs_watermark_score — greenlist z-test per source
# ---------------------------------------------------------------------------


def q_docs_watermark_score(sf_dir: str):
    """Watermark detection audit (Kirchenbauer et al. 2023, simplified):
    a bigram (prev, cur) is GREEN when fnv64(prev || ':' || cur) is even —
    the hash-seeded half-vocabulary greenlist. Per source: bigram count,
    green count and the one-proportion z = (2g − n)/√n; flagged at z > 4.
    Output: source, n_bigrams, n_green, z_micro, flagged.

    Scale shape: bigrams hash inside each batch (join + FNV off Arrow
    buffers — text never leaves the stage); one bounded (source, n, g)
    combiner folds on the driver."""
    from ..functions.hashing import fnv1a64_arrow

    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.maximum(np.diff(off) - 1, 0)
        if counts.sum() == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "g": pd.Series([], dtype=np.int64)}
            )
        starts = off[:-1]
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            first, counts
        )
        i0 = np.repeat(starts, counts) + within
        prev = flat.take(pa.array(i0))
        cur = flat.take(pa.array(i0 + 1))
        big = pc.binary_join_element_wise(prev, cur, ":")
        hv = fnv1a64_arrow(big)
        green = (hv % np.uint64(2) == np.uint64(0)).astype(np.int64)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), object), counts
        )
        df = pd.DataFrame({"source": src, "n": 1, "g": green})
        return df.groupby("source", sort=False, as_index=False).sum().astype(
            {"n": np.int64, "g": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_bigrams", "n_green", "z_micro", "flagged"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    g = part.groupby("source")[["n", "g"]].sum().sort_index()
    n = g["n"].to_numpy(np.float64)
    gr = g["g"].to_numpy(np.float64)
    z = (2.0 * gr - n) / np.sqrt(n)
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_bigrams": g["n"].to_numpy(np.int64),
            "n_green": g["g"].to_numpy(np.int64),
            "z_micro": np.floor(z * 1_000_000.0 + 0.5).astype(np.int64),
            "flagged": (z > 4.0).astype(np.int64),
        }
    )


ORACLES214["docs_watermark_score"] = f"""
WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
big AS (
  SELECT source,
         unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ':' || ws[i+1])) AS bg
  FROM w WHERE len(ws) >= 2
),
h AS (
  SELECT source,
         CASE WHEN {_fnv64_sql('bg')} % 2 = 0 THEN 1 ELSE 0 END AS green
  FROM big
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(green) AS BIGINT) AS gr
  FROM h GROUP BY 1
)
SELECT source, n AS n_bigrams, gr AS n_green,
       CAST(floor((2.0 * gr - n) / sqrt(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS z_micro,
       CAST(CASE WHEN (2.0 * gr - n) / sqrt(CAST(n AS DOUBLE)) > 4.0
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM g ORDER BY source"""


# ---------------------------------------------------------------------------
# emb_diag_lda — per-dimension discriminability between labels 0 and 1
# ---------------------------------------------------------------------------


def q_emb_diag_lda(sf_dir: str):
    """Diagonal Fisher LDA between embedding classes 0 and 1: per dimension
    the class means and the score (μ₁−μ₀)²/σ²_pooled (pooled within-class
    variance, n₀+n₁−2 dof); top-5 dimensions (score DESC, dim ASC) with the
    total separation Σ_d score as a constant column. Output: dim,
    mu0_micro, mu1_micro, score_micro, total_micro.

    Scale shape: zero-copy FixedSizeList flatten → per-batch (label, dim)
    moment combiner; the 64×2 grid folds on the driver."""
    path = f"{sf_dir}/embeddings.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
        keep = (lab == 0) | (lab == 1)
        if not keep.any():
            return pd.DataFrame(
                {"label": pd.Series([], dtype=np.int64),
                 "dim": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "s": pd.Series([], dtype=np.float64),
                 "s2": pd.Series([], dtype=np.float64)}
            )
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
            outs.append(
                pd.DataFrame(
                    {
                        "label": np.int64(c),
                        "dim": np.arange(d, dtype=np.int64),
                        "n": np.int64(len(sub)),
                        "s": sub.sum(axis=0),
                        "s2": (sub * sub).sum(axis=0),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    part = (
        ray.data.read_parquet(path, columns=["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["dim", "mu0_micro", "mu1_micro", "score_micro", "total_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby(["label", "dim"]).sum()
    n0 = g.loc[0, "n"].iloc[0] if 0 in g.index.get_level_values(0) else 0
    n1 = g.loc[1, "n"].iloc[0] if 1 in g.index.get_level_values(0) else 0
    if n0 < 2 or n1 < 2:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    d0, d1 = g.loc[0], g.loc[1]
    mu0 = d0["s"].to_numpy(np.float64) / float(n0)
    mu1 = d1["s"].to_numpy(np.float64) / float(n1)
    sse0 = d0["s2"].to_numpy(np.float64) - mu0 * mu0 * float(n0)
    sse1 = d1["s2"].to_numpy(np.float64) - mu1 * mu1 * float(n1)
    pooled = (sse0 + sse1) / float(n0 + n1 - 2)
    score = (mu1 - mu0) * (mu1 - mu0) / pooled
    total = float(score.sum())
    df = pd.DataFrame(
        {
            "dim": np.arange(len(score), dtype=np.int64),
            "mu0_micro": np.floor(mu0 * 1_000_000.0 + 0.5).astype(np.int64),
            "mu1_micro": np.floor(mu1 * 1_000_000.0 + 0.5).astype(np.int64),
            "score_micro": np.floor(score * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )
    df = df.sort_values(
        ["score_micro", "dim"], ascending=[False, True], kind="mergesort"
    ).head(5)
    df["total_micro"] = np.int64(np.floor(total * 1_000_000.0 + 0.5))
    return df.reset_index(drop=True).astype(np.int64)


ORACLES214["emb_diag_lda"] = """
WITH e AS (
  SELECT label, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings WHERE label IN (0, 1)
),
m AS (
  SELECT dim,
         sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN label = 0 THEN CAST(x AS DOUBLE) ELSE 0.0 END) AS s0,
         sum(CASE WHEN label = 1 THEN CAST(x AS DOUBLE) ELSE 0.0 END) AS s1,
         sum(CASE WHEN label = 0 THEN CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                  ELSE 0.0 END) AS q0,
         sum(CASE WHEN label = 1 THEN CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                  ELSE 0.0 END) AS q1
  FROM e GROUP BY 1
),
sc AS (
  SELECT dim,
         s0 / n0 AS mu0, s1 / n1 AS mu1,
         (s1 / n1 - s0 / n0) * (s1 / n1 - s0 / n0)
           / ((q0 - (s0 / n0) * (s0 / n0) * n0
               + q1 - (s1 / n1) * (s1 / n1) * n1) / (n0 + n1 - 2)) AS score
  FROM m WHERE n0 >= 2 AND n1 >= 2
),
tot AS (SELECT sum(score) AS t FROM sc)
SELECT CAST(sc.dim AS BIGINT) AS dim,
       CAST(floor(mu0 * 1000000.0 + 0.5) AS BIGINT) AS mu0_micro,
       CAST(floor(mu1 * 1000000.0 + 0.5) AS BIGINT) AS mu1_micro,
       CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS score_micro,
       CAST(floor(tot.t * 1000000.0 + 0.5) AS BIGINT) AS total_micro
FROM sc, tot
ORDER BY score_micro DESC, dim ASC LIMIT 5"""


QUERIES214 = {
    "docs_watermark_score": q_docs_watermark_score,
    "emb_diag_lda": q_emb_diag_lda,
}
