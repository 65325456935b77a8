"""Driver-contract queries, wave 111 — leave-one-out kNN label agreement
(each probe's 5 nearest cosine neighbors vote on its label: the label-noise
/ class-separability screen curation runs before training) and tool
argument profile (per parsed tool: call volume, distinct-argument
cardinality and the modal argument — the cache-design readout for agent
tooling). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES111: dict[str, str] = {}

_KNN_PROBES = 50
_KNN_K = 5


# ---------------------------------------------------------------------------
# emb_knn_label_agreement — LOO kNN majority vote vs own label
# ---------------------------------------------------------------------------


def q_emb_knn_label_agreement(sf_dir: str):
    """LOO kNN probe: for the first {P} vectors, the majority label of the
    {K} nearest cosine neighbors (self excluded; vote ties → smaller label;
    rank ties → smaller id) compared against the probe's own label —
    per-label agreement in exact basis points. Low agreement flags label
    noise or entangled classes.

    Scale shape: the ann_topk shape — probe matrix broadcast once; each
    batch emits its local top-{K} partials WITH neighbor labels attached
    (batch-local searchsorted, no global label table anywhere); the driver
    merges |probes|×{K} rows and votes.""".format(P=_KNN_PROBES, K=_KNN_K)
    import ray
    import pyarrow.parquet as pq_mod

    from ..functions.vectors import stack_list_column, topk_partials
    from ..stages.similarity import _unit

    head = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).slice(0, _KNN_PROBES)
    q = _unit(stack_list_column(head["embedding"]))
    qids = head["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qlab = head["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    qref = ray.put((q, qids))

    def local_topk(t: pa.Table) -> pd.DataFrame:
        qm, qids_ = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = _unit(stack_list_column(t["embedding"])) @ qm.T
        qid, nid, score = topk_partials(sims, ids, qids_, _KNN_K + 1)
        order = np.argsort(ids, kind="mergesort")
        pos = np.searchsorted(ids[order], nid)
        nlab = labs[order][pos]
        return pd.DataFrame(
            {"query_id": qid, "neighbor_id": nid, "nlab": nlab, "score": score}
        )

    partials = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()  # bounded: probes × (K+1) per block
    )
    lab_of = dict(zip(qids.tolist(), qlab.tolist()))
    per_label: dict[int, list[int]] = {}
    for qid, g in partials.groupby("query_id"):
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(_KNN_K)
        votes = g["nlab"].value_counts()
        top = votes.max()
        pred = int(min(votes[votes == top].index))
        own = int(lab_of[int(qid)])
        per_label.setdefault(own, []).append(int(pred == own))
    rows = []
    for lab in sorted(per_label):
        v = per_label[lab]
        rows.append(
            {
                "label": lab,
                "n_probes": len(v),
                "n_agree": int(sum(v)),
                "agree_bp": int(sum(v)) * 10_000 // len(v),
            }
        )
    return pd.DataFrame(rows, columns=["label", "n_probes", "n_agree", "agree_bp"]).astype(
        np.int64
    )


ORACLES111["emb_knn_label_agreement"] = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS qlab
  FROM embeddings ORDER BY vec_id LIMIT {_KNN_PROBES}
),
scored AS (
  SELECT q.qid, q.qlab, e.vec_id AS nid, e.label AS nlab,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS score
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, qlab, nlab,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn
  FROM scored
),
votes AS (
  SELECT qid, qlab, nlab, count(*) AS c
  FROM ranked WHERE rn <= {_KNN_K} GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, qlab, nlab AS p
  FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY c DESC, nlab) AS rr FROM votes)
  WHERE rr = 1
)
SELECT CAST(qlab AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(count(*) FILTER (p = qlab) AS BIGINT) AS n_agree,
       CAST(count(*) FILTER (p = qlab) * 10000 // count(*) AS BIGINT)
         AS agree_bp
FROM pred GROUP BY 1"""


# ---------------------------------------------------------------------------
# tools_arg_profile — call volume, arg cardinality and modal arg per tool
# ---------------------------------------------------------------------------


def q_tools_arg_profile(sf_dir: str):
    """Tool argument profile over the parsed transcripts: per tool, the
    call count, DISTINCT argument cardinality and the modal argument (ties
    → lexicographically smallest) — the memoization-design readout for
    agent tool gateways.

    Scale shape: per-batch (tool, arg, n) combiner partials → ONE arg-hash
    bucket exchange (args are unbounded: the >10k-group rule) → per-bucket
    exact re-reduce emits (tool, distincts, local-mode candidates); the
    driver folds bounded |tools|×|buckets| rows and picks the global
    mode."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        tool = np.asarray(t["tool_name"].to_numpy(zero_copy_only=False))
        arg = np.asarray(t["call_arg"].to_numpy(zero_copy_only=False))
        m = pd.notna(tool) & pd.notna(arg)
        df = pd.DataFrame({"tool": tool[m], "arg": arg[m]})
        g = df.groupby(["tool", "arg"], sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["_b"] = (
            fnv1a64_array(g["arg"].astype(str).to_numpy(object)) % np.uint64(16)
        ).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["tool", "arg"], sort=False)["n"].sum().reset_index()
        # per tool: this bucket's distinct args, calls, and local mode
        m = m.sort_values(["tool", "n", "arg"], ascending=[True, False, True])
        top = m.drop_duplicates("tool", keep="first")
        agg = m.groupby("tool", sort=False)["n"].agg(["size", "sum"]).reset_index()
        agg.columns = ["tool", "nd", "calls"]
        out = agg.merge(top[["tool", "arg", "n"]], on="tool")
        out.columns = ["tool", "nd", "calls", "mode_arg", "mode_n"]
        return out.astype({"nd": np.int64, "calls": np.int64, "mode_n": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |tools| rows per bucket
    )
    rows = []
    for tool, g in sorted(part.groupby("tool")):
        calls = int(g["calls"].sum())
        nd = int(g["nd"].sum())  # buckets partition args ⇒ distincts add
        g = g.sort_values(["mode_n", "mode_arg"], ascending=[False, True])
        rows.append(
            {
                "tool": tool,
                "n_calls": calls,
                "n_distinct_args": nd,
                "mode_arg": g["mode_arg"].iloc[0],
                "mode_n": int(g["mode_n"].iloc[0]),
            }
        )
    out = pd.DataFrame(
        rows, columns=["tool", "n_calls", "n_distinct_args", "mode_arg", "mode_n"]
    )
    for c in ["n_calls", "n_distinct_args", "mode_n"]:
        out[c] = out[c].astype(np.int64)
    return out


def _arg_profile_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, calls AS (
  SELECT tool_name AS tool, call_arg AS arg
  FROM parsed WHERE tool_name IS NOT NULL AND call_arg IS NOT NULL
),
pc AS (SELECT tool, arg, CAST(count(*) AS BIGINT) AS n FROM calls GROUP BY 1, 2),
md AS (
  SELECT tool, arg AS mode_arg, n AS mode_n
  FROM (SELECT *, row_number() OVER (PARTITION BY tool
                                     ORDER BY n DESC, arg) AS r FROM pc)
  WHERE r = 1
)
SELECT pc.tool,
       CAST(sum(pc.n) AS BIGINT) AS n_calls,
       CAST(count(*) AS BIGINT) AS n_distinct_args,
       max(md.mode_arg) AS mode_arg,
       CAST(max(md.mode_n) AS BIGINT) AS mode_n
FROM pc JOIN md USING (tool)
GROUP BY 1"""
    )


ORACLES111["tools_arg_profile"] = _arg_profile_oracle()


QUERIES111 = {
    "emb_knn_label_agreement": q_emb_knn_label_agreement,
    "tools_arg_profile": q_tools_arg_profile,
}
