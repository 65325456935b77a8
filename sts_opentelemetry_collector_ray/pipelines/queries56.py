"""Driver-contract queries, wave 56 — Q19-shaped disjunctive broadcast-join
revenue scan (the OR-of-ANDs predicate pattern that defeats naive pushdown)
and matryoshka-truncation retrieval overlap (how much of full-dim top-k an
embedding prefix preserves — the dim-budget decision for ANN serving). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES56: dict[str, str] = {}

# (brand, max_size, qty_lo, qty_hi) — three disjunctive branches, Q19-style
_Q19_BRANCHES = (
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)
_MAT_DIM = 16  # matryoshka prefix length
_MAT_K = 10
_MAT_NQ = 5


# ---------------------------------------------------------------------------
# q19_brand_quantity — disjunctive predicate revenue over a broadcast join
# ---------------------------------------------------------------------------


def q_q19_brand_quantity(sf_dir: str):
    """TPC-H Q19-shaped scan: revenue from lineitems whose part satisfies any
    of three (brand, size-range, quantity-range) conjunctions. Revenue is
    EXACT integer micro-dollars: Σ cents · (100 − disc_pct) · 100 — no
    float-order hazard (per-batch int64 partials, arbitrary-precision driver
    fold).

    Scale shape: `part` is the bounded small side — per-branch eligible
    partkey sets broadcast once via ``ray.put``; per batch ONE ``np.isin``
    membership + quantity mask per branch; |branches| partial rows per block,
    no shuffle (the broadcast-semi-join alternative to an all-to-all join)."""
    import ray
    import pyarrow.parquet as pq_mod

    part = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pk = part["p_partkey"].to_numpy()
    brand = part["p_brand"].to_numpy(zero_copy_only=False)
    size = part["p_size"].to_numpy()
    keysets = []
    for b, smax, _, _ in _Q19_BRANCHES:
        keysets.append(np.sort(pk[(brand == b) & (size >= 1) & (size <= smax)]))
    keys_ref = ray.put(keysets)

    def partial(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        lpk = t["l_partkey"].to_numpy()
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = cents * (100 - dpct) * 100  # micro-dollars, exact
        out_b, out_r, out_n = [], [], []
        for i, (_, _, qlo, qhi) in enumerate(_Q19_BRANCHES):
            # sorted-array membership: position then exact-hit confirm
            idx = np.searchsorted(ks[i], lpk)
            hit = np.zeros(len(lpk), dtype=bool)
            inb = idx < len(ks[i])
            hit[inb] = ks[i][idx[inb]] == lpk[inb]
            mask = (qty >= qlo) & (qty <= qhi) & hit
            out_b.append(i)
            out_r.append(int(rev[mask].sum()))
            out_n.append(int(mask.sum()))
        return pa.table(
            {
                "branch": pa.array(out_b, pa.int64()),
                "rev": pa.array(out_r, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |branches| rows per block
    )
    g = parts.groupby("branch").agg(rev=("rev", "sum"), n=("n", "sum"))
    rows = []
    for i, (b, smax, qlo, qhi) in enumerate(_Q19_BRANCHES):
        rev = int(g.loc[i, "rev"]) if i in g.index else 0
        n = int(g.loc[i, "n"]) if i in g.index else 0
        rows.append((b, rev, n))
    total = sum(r[1] for r in rows)
    out = pd.DataFrame(
        {
            "p_brand": [r[0] for r in rows] + ["ALL"],
            "revenue_micro": np.array([r[1] for r in rows] + [total], np.int64),
            "n_items": np.array(
                [r[2] for r in rows] + [sum(r[2] for r in rows)], np.int64
            ),
        }
    )
    return out


def _q19_oracle() -> str:
    branches = []
    for b, smax, qlo, qhi in _Q19_BRANCHES:
        branches.append(
            f"""
  SELECT '{b}' AS p_brand,
         CAST(coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                           * 100), 0) AS BIGINT) AS revenue_micro,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{b}' AND p_size BETWEEN 1 AND {smax}
    AND l_quantity BETWEEN {qlo} AND {qhi}"""
        )
    union = "\n  UNION ALL".join(branches)
    return f"""
WITH b AS ({union}
)
SELECT p_brand, revenue_micro, n_items FROM b
UNION ALL
SELECT 'ALL', CAST(sum(revenue_micro) AS BIGINT), CAST(sum(n_items) AS BIGINT)
FROM b"""


ORACLES56["q19_brand_quantity"] = _q19_oracle()


# ---------------------------------------------------------------------------
# emb_matryoshka_overlap — full-dim vs 16-dim-prefix top-k agreement
# ---------------------------------------------------------------------------


def q_emb_matryoshka_overlap(sf_dir: str):
    """Matryoshka evaluation: for the first 5 vectors as queries, compare the
    exact cosine top-10 under the FULL 64-dim embedding vs the first-16-dim
    prefix (truncate-then-renormalize); report |intersection| per query. The
    number that decides whether a 4× cheaper prefix index is good enough.

    Scale shape: two broadcast-matmul passes over the corpus (the no-branch
    rule: the source is re-read per pass), per-batch local top-k partials,
    bounded driver merge — identical shape to `ann_topk`."""
    from ..pipelines.queries2 import _load_queries
    from ..stages.similarity import _unit, brute_force_topk
    from ..functions.vectors import stack_list_column, topk_partials
    import ray

    q, qids = _load_queries(sf_dir, n=_MAT_NQ)
    ds_full = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full = brute_force_topk(ds_full, q, qids, k=_MAT_K)

    qt = _unit(np.asarray(q, dtype=np.float64)[:, :_MAT_DIM])
    qref = ray.put((qt, np.asarray(qids)))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qi = ray.get(qref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        mat = stack_list_column(t["embedding"])[:, :_MAT_DIM]
        sims = _unit(mat) @ qm.T
        qid, nid, score = topk_partials(sims, ids, qi, _MAT_K + 1)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "neighbor_id": pa.array(nid, pa.int64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    partials = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()  # bounded: (k+1) rows per query per block
    )
    tr = []
    for qid, g in partials.groupby("query_id"):
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(_MAT_K)
        tr.append(g[["query_id", "neighbor_id"]])
    trunc = pd.concat(tr, ignore_index=True)

    fset = full.groupby("query_id")["neighbor_id"].agg(set)
    rows = []
    for qid in sorted(np.asarray(qids).astype(np.int64)):
        tn = set(trunc.loc[trunc["query_id"] == qid, "neighbor_id"].astype(int))
        fn = fset.get(qid, set())
        rows.append((int(qid), len(tn & set(int(x) for x in fn))))
    return pd.DataFrame(
        {
            "query_id": np.array([r[0] for r in rows], np.int64),
            "n_common": np.array([r[1] for r in rows], np.int64),
            "k": np.full(len(rows), _MAT_K, np.int64),
        }
    )


ORACLES56["emb_matryoshka_overlap"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {_MAT_NQ}
),
rf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             q.qv) DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_MAT_K}
),
rt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(
                        CAST(e.embedding[1:{_MAT_DIM}] AS DOUBLE[]),
                        q.qv[1:{_MAT_DIM}]) DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {_MAT_K}
)
SELECT q.query_id,
       CAST((SELECT count(*) FROM rf JOIN rt
             ON rf.query_id = q.query_id AND rt.query_id = q.query_id
            AND rf.neighbor_id = rt.neighbor_id) AS BIGINT) AS n_common,
       CAST({_MAT_K} AS BIGINT) AS k
FROM q ORDER BY q.query_id"""


QUERIES56 = {
    "q19_brand_quantity": q_q19_brand_quantity,
    "emb_matryoshka_overlap": q_emb_matryoshka_overlap,
}
