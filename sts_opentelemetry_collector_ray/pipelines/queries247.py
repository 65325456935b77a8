"""Driver-contract queries, wave 247 — SemDeDup-style per-cluster
embedding pruning (Abbas et al. 2023: inside each cluster keep the
vectors farthest from the centroid, drop the redundant core) and test-set
4-gram novelty under the deterministic even/odd doc split (the complement
of the Bloom-filter decontamination probe).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES247: dict[str, str] = {}

_GRAM_N = 4


# ---------------------------------------------------------------------------
# emb_semdedup_prune — keep the far half of every label cluster
# ---------------------------------------------------------------------------


def q_emb_semdedup_prune(sf_dir: str):
    """Per label cluster: rank vectors by quantized squared distance to
    the cluster centroid d2q = ⌊‖x−μ_c‖²·10⁶+0.5⌋ (DESC, vec_id ASC) and
    keep the top ⌈n_c/2⌉ — the SemDeDup prune that drops the redundant
    near-centroid core. Output: label, n, n_kept, cut_d2q (the smallest
    kept distance).

    Scale shape: pass 1 folds per-label centroids from (label, dim) sums;
    pass 2 folds per-vector distances against broadcast centroids — the
    per-label rank is bounded by cluster size (bucketed top-k at 100 TB)."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "label", "embedding"])

    def mom_partial(t: pa.Table) -> pd.DataFrame:
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // max(len(lab), 1)
        mat = flat.reshape(len(lab), d)
        out = []
        for c in np.unique(lab):
            sub = mat[lab == c]
            out.append(
                pd.DataFrame(
                    {"label": np.int64(c),
                     "dim": np.arange(-1, d, dtype=np.int64),
                     "v": np.concatenate([[np.float64(len(sub))],
                                          sub.sum(axis=0)])}
                )
            )
        return pd.concat(out, ignore_index=True)

    mom = ds.map_batches(mom_partial, batch_format="pyarrow").to_pandas()
    cols = ["label", "n", "n_kept", "cut_d2q"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if mom.empty:
        return empty
    fold = mom.groupby(["label", "dim"])["v"].sum().unstack("dim")
    n_c = fold[-1]
    mu = fold[[c for c in fold.columns if c >= 0]].div(n_c, axis=0)
    mu_map = {int(lab): mu.loc[lab].to_numpy(np.float64) for lab in mu.index}

    def dist_partial(t: pa.Table) -> pd.DataFrame:
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), np.int64)
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), np.int64)
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // max(len(lab), 1)
        mat = flat.reshape(len(lab), d)
        cent = np.stack([mu_map[int(c)] for c in lab])
        d2 = ((mat - cent) ** 2).sum(axis=1)
        return pd.DataFrame(
            {"label": lab, "vec_id": ids,
             "d2q": np.floor(d2 * 1_000_000.0 + 0.5).astype(np.int64)}
        )

    dist = ds.map_batches(dist_partial, batch_format="pyarrow").to_pandas()
    rows = []
    for lab, sub in dist.groupby("label", sort=True):
        sub = sub.sort_values(
            ["d2q", "vec_id"], ascending=[False, True], kind="mergesort"
        )
        n = len(sub)
        k = (n + 1) // 2
        kept = sub.head(k)
        rows.append(
            (np.int64(lab), np.int64(n), np.int64(k),
             np.int64(kept["d2q"].min()))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES247["emb_semdedup_prune"] = """
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
d2 AS (
  SELECT e.label, e.vec_id,
         CAST(floor(sum((CAST(e.x AS DOUBLE) - mu.m)
                        * (CAST(e.x AS DOUBLE) - mu.m))
                    * 1000000.0 + 0.5) AS BIGINT) AS d2q
  FROM e JOIN mu ON e.label = mu.label AND e.dim = mu.dim
  GROUP BY 1, 2
),
rk AS (
  SELECT label, vec_id, d2q,
         row_number() OVER (PARTITION BY label
                            ORDER BY d2q DESC, vec_id) AS rn,
         count(*) OVER (PARTITION BY label) AS n
  FROM d2
)
SELECT CAST(label AS BIGINT) AS label, CAST(any_value(n) AS BIGINT) AS n,
       CAST((any_value(n) + 1) // 2 AS BIGINT) AS n_kept,
       CAST(min(d2q) AS BIGINT) AS cut_d2q
FROM rk WHERE rn <= (n + 1) // 2
GROUP BY label ORDER BY label"""


# ---------------------------------------------------------------------------
# docs_split_novelty — test 4-grams unseen in the train split
# ---------------------------------------------------------------------------


def q_docs_split_novelty(sf_dir: str):
    """Per source: among the ODD-doc_id (test) documents' word 4-gram
    OCCURRENCES, the fraction whose 4-gram string never occurs in any
    EVEN-doc_id (train) document — the memorization/novelty complement of
    Bloom decontamination. Output: source, n_test_grams, n_novel,
    novelty_micro.

    Scale shape: gram construction is per-batch Arrow joins; the train
    membership set is vocabulary-bounded here (the 100 TB path is the
    hash-bucketed anti-join of stages/dedup_docs.py or the Bloom probe)."""
    path = f"{sf_dir}/documents.parquet"

    def grams_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        raw = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        keep = raw != ""
        flat, di = raw[keep], di[keep]
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        src = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        n = len(flat)
        if n < _GRAM_N:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "train": pd.Series([], dtype=np.int64),
                 "g": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=np.int64)}
            )
        valid = np.ones(n - _GRAM_N + 1, dtype=bool)
        for j in range(1, _GRAM_N):
            valid &= di[: n - _GRAM_N + 1] == di[j: n - _GRAM_N + 1 + j]
        starts = np.flatnonzero(valid)
        parts = [pa.array(flat[starts + j]) for j in range(_GRAM_N)]
        grams = pc.binary_join_element_wise(*parts, " ")
        gdoc = di[starts]
        df = pd.DataFrame(
            {"source": src[gdoc],
             "train": (ids[gdoc] % 2 == 0).astype(np.int64),
             "g": np.asarray(grams.to_numpy(zero_copy_only=False), object)}
        )
        return (
            df.groupby(["source", "train", "g"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "doc_id", "text"])
        .map_batches(grams_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_test_grams", "n_novel", "novelty_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    fold = part.groupby(["source", "train", "g"], as_index=False)["c"].sum()
    train_set = set(fold.loc[fold["train"] == 1, "g"].unique())
    te = fold[fold["train"] == 0].copy()
    if te.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    te["novel"] = (~te["g"].isin(train_set)).astype(np.int64) * te["c"]
    g = te.groupby("source").agg(
        n_test_grams=("c", "sum"), n_novel=("novel", "sum")
    ).sort_index()
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_test_grams": g["n_test_grams"].to_numpy(np.int64),
            "n_novel": g["n_novel"].to_numpy(np.int64),
            "novelty_micro": np.floor(
                g["n_novel"].to_numpy(np.float64)
                / g["n_test_grams"].to_numpy(np.float64)
                * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    )


ORACLES247["docs_split_novelty"] = f"""
WITH w AS (
  SELECT source, doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
g AS (
  SELECT source, doc_id % 2 = 0 AS train,
         ws[j] || ' ' || ws[j + 1] || ' ' || ws[j + 2] || ' ' || ws[j + 3]
           AS gram
  FROM w, unnest(range(1, len(ws) - {_GRAM_N} + 2)) AS u(j)
  WHERE len(ws) >= {_GRAM_N}
),
tr AS (SELECT DISTINCT gram FROM g WHERE train),
te AS (SELECT source, gram FROM g WHERE NOT train)
SELECT te.source,
       CAST(count(*) AS BIGINT) AS n_test_grams,
       CAST(sum(CASE WHEN tr.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(floor(CAST(sum(CASE WHEN tr.gram IS NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS novelty_micro
FROM te LEFT JOIN tr ON te.gram = tr.gram
GROUP BY te.source ORDER BY te.source"""


QUERIES247 = {
    "emb_semdedup_prune": q_emb_semdedup_prune,
    "docs_split_novelty": q_docs_split_novelty,
}
