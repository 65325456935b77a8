"""Driver-contract queries, wave 29 — hard-negative mining (nearest
non-duplicate neighbors, the retrieval-training sampling op) and an
ANN recall report (the engine self-grading its approximate path against the
exact baseline). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES29: dict[str, str] = {}

_HN_TAU = 0.45  # the emb_neardup duplicate threshold
_HN_K = 10


# ---------------------------------------------------------------------------
# emb_hard_negatives — top-k nearest NON-duplicate neighbors per query
# ---------------------------------------------------------------------------


def q_emb_hard_negatives(sf_dir: str):
    """Hard-negative mining for retrieval training: for each query vector the
    top-10 most similar corpus vectors that are NOT near-duplicates
    (cosine < 0.45, the `emb_neardup` threshold) — the closest negatives are
    the hardest and most valuable. Same scale shape as `brute_force_topk`:
    broadcast query matrix, per-batch matmul with the exclusion mask applied
    BEFORE the partial top-k (masked entries → −inf, so per-batch top-k of
    the masked set merges exactly), bounded driver merge of (blocks × q × k)
    partials."""
    from ..stages.similarity import _unit, stack_list_column, topk_partials
    from .queries2 import _load_queries

    q, qids = _load_queries(sf_dir)
    qmat = _unit(np.asarray(q, dtype=np.float64))
    qref = ray.put((qmat, np.asarray(qids)))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def local(t: pa.Table) -> pa.Table:
        qm, qi = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        sims = _unit(stack_list_column(t["embedding"]).astype(np.float64)) @ qm.T
        sims = np.where(sims >= _HN_TAU, -np.inf, sims)  # drop near-dups
        sims = np.where(ids[:, None] == qi[None, :], -np.inf, sims)  # drop self
        qid, nid, score = topk_partials(sims, ids, qi, _HN_K)
        m = np.isfinite(score)
        return pa.table(
            {
                "query_id": pa.array(qid[m], pa.int64()),
                "neighbor_id": pa.array(nid[m], pa.int64()),
                "score": pa.array(score[m], pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(_HN_K)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g[["query_id", "neighbor_id", "rank"]])
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["query_id", "neighbor_id", "rank"])
    )


ORACLES29["emb_hard_negatives"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored WHERE score < {_HN_TAU}
)
SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id, rank
FROM ranked WHERE rank <= {_HN_K}"""


# ---------------------------------------------------------------------------
# ann_recall_report — recall@10 of the LSH path vs the exact baseline
# ---------------------------------------------------------------------------


def q_ann_recall_report(sf_dir: str):
    """Self-evaluation of the approximate path: recall@10 of `ann_lsh`
    against the exact `ann_topk` baseline per query — the report a curation
    pipeline checks before trusting an ANN shortcut at scale. Both member
    pipelines are the oracled operators themselves; the comparison is a
    |queries|×k driver-side merge."""
    from .queries2 import q_ann_lsh, q_ann_topk

    exact = q_ann_topk(sf_dir)
    approx = q_ann_lsh(sf_dir)
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    if not isinstance(approx, pd.DataFrame):
        approx = approx.to_pandas()
    m = exact.merge(
        approx[["query_id", "neighbor_id"]],
        on=["query_id", "neighbor_id"],
        how="left",
        indicator=True,
    )
    g = (
        m.assign(hit=(m["_merge"] == "both").astype(np.int64))
        .groupby("query_id")["hit"]
        .sum()
        .reset_index()
    )
    return pd.DataFrame(
        {
            "query_id": g["query_id"].to_numpy(),
            "n_hits": g["hit"].to_numpy().astype(np.int64),
            "recall": g["hit"].to_numpy().astype(np.float64) / 10.0,
        }
    )


def _recall_oracle() -> str:
    from .queries2 import ORACLES2

    return f"""
WITH exact AS (SELECT * FROM ({ORACLES2["ann_topk"]}) x),
approx AS (SELECT * FROM ({ORACLES2["ann_lsh"]}) y)
SELECT e.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(a.neighbor_id) AS DOUBLE) / 10.0 AS recall
FROM exact e
LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY 1"""


ORACLES29["ann_recall_report"] = _recall_oracle()


QUERIES29 = {
    "emb_hard_negatives": q_emb_hard_negatives,
    "ann_recall_report": q_ann_recall_report,
}
