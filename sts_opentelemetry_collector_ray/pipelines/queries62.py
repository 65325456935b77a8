"""Driver-contract queries, wave 62 — cross-nation trade-flow matrix (the
who-buys-from-whom revenue grid over a big×big key join plus broadcast
dimensions) and PQ asymmetric-distance top-k (querying the wave-54 PQ codes
the way IVF-PQ serving does). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES62: dict[str, str] = {}

_FLOW_BUCKETS = 64
_ADC_K = 10
_ADC_NQ = 5


# ---------------------------------------------------------------------------
# nation_flow_matrix — customer-nation × supplier-nation revenue grid
# ---------------------------------------------------------------------------


def q_nation_flow_matrix(sf_dir: str):
    """Trade-flow matrix: lineitem revenue (EXACT integer micro-dollars)
    aggregated by (customer nation, supplier nation) — the |nations|² grid
    behind trade-balance dashboards.

    Scale shape: customer/supplier/nation are the broadcast dimension side
    (`ray.put` once, read per bucket); lineitem×orders resolve custkey via
    ONE tagged orderkey-bucket exchange (the ship-latency big×big pattern);
    only the bounded |nations|² grid leaves the buckets."""
    import ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    dims_ref = ray.put((c2n, s2n, names))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "rev": cents * (100 - dpct) * 100,
                "cust": np.int64(-1),
                "_b": (k % _FLOW_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "rev": np.int64(0),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _FLOW_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_, names_ = ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp", "rev"]]
        m = li.merge(o, on="k")
        cn = m["cust"].map(c2n_).map(names_)
        sn = m["supp"].map(s2n_).map(names_)
        h = (
            pd.DataFrame({"cust_nation": cn, "supp_nation": sn, "rev": m["rev"]})
            .groupby(["cust_nation", "supp_nation"], sort=False)
            .agg(revenue_micro=("rev", "sum"), n_items=("rev", "size"))
            .reset_index()
        )
        h["revenue_micro"] = h["revenue_micro"].astype(np.int64)
        h["n_items"] = h["n_items"].astype(np.int64)
        return h

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    out = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |nations|^2 per bucket
        .groupby(["cust_nation", "supp_nation"])
        .agg(revenue_micro=("revenue_micro", "sum"), n_items=("n_items", "sum"))
        .reset_index()
        .sort_values(["cust_nation", "supp_nation"], kind="mergesort")
        .reset_index(drop=True)
    )
    out["revenue_micro"] = out["revenue_micro"].astype(np.int64)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out


ORACLES62["nation_flow_matrix"] = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                * 100) AS BIGINT) AS revenue_micro,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# emb_pq_adc_topk — asymmetric-distance top-k over the wave-54 PQ codes
# ---------------------------------------------------------------------------


def q_emb_pq_adc_topk(sf_dir: str):
    """ADC retrieval over PQ codes: score(q, x) = Σₘ ⟨q_m, codebookₘ[codeₘ(x)]⟩
    — the query stays full-precision, the corpus is its 4 nibble codes, and
    scoring is 4 lookup-table gathers per candidate (how IVF-PQ serves).
    Returns the top-10 per query with (score DESC, id ASC) determinism.

    Scale shape: the 4×|queries|×16 LUT is built once on the driver and
    broadcast; each batch encodes (4 argmax matmuls, zero-copy ingest) and
    scores via pure gathers; local top-k partials, bounded driver merge —
    the ann_topk shape with O(M·K) instead of O(d) per candidate."""
    import ray

    from .queries2 import _load_queries
    from .queries54 import _PQ_DIM, _PQ_K, _PQ_M, _pq_codebooks
    from ..functions.vectors import stack_list_column, topk_partials

    q, qids = _load_queries(sf_dir, n=_ADC_NQ)
    books = _pq_codebooks()
    sub = _PQ_DIM // _PQ_M
    qm = np.asarray(q, dtype=np.float64)
    luts = [qm[:, m * sub : (m + 1) * sub] @ books[m].T for m in range(_PQ_M)]
    ref = ray.put((luts, np.asarray(qids), books))

    def local_topk(t: pa.Table) -> pa.Table:
        luts_, qids_, books_ = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        v = stack_list_column(t["embedding"])
        sims = None
        for m, cb in enumerate(books_):
            codes = (v[:, m * sub : (m + 1) * sub] @ cb.T).argmax(axis=1)
            term = luts_[m][:, codes].T  # (n, q)
            sims = term if sims is None else sims + term
        qid, nid, score = topk_partials(sims, ids, qids_, _ADC_K + 1)
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
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(_ADC_K)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g[["query_id", "neighbor_id", "rank"]])
    return pd.concat(out, ignore_index=True)


def _adc_oracle() -> str:
    from .queries54 import _PQ_DIM, _PQ_K, _PQ_M, _pq_codebooks

    books = _pq_codebooks()
    sub = _PQ_DIM // _PQ_M
    with_parts, score_terms = [], []
    for m, cb in enumerate(books):
        values = ",\n    ".join(
            f"({ci}, [" + ", ".join(repr(float(x)) for x in cb[ci]) + "])"
            for ci in range(_PQ_K)
        )
        with_parts.append(
            f"cb{m}(cid, c) AS (SELECT * FROM (VALUES\n    {values}) t(cid, c))"
        )
        with_parts.append(
            f"""a{m} AS (
  SELECT vec_id, c AS cw{m}
  FROM (
    SELECT sl.vec_id, cb{m}.c,
           row_number() OVER (PARTITION BY sl.vec_id
                              ORDER BY list_dot_product(v{m}, c) DESC, cid ASC)
             AS r
    FROM sl, cb{m}
  ) WHERE r = 1
)"""
        )
        score_terms.append(
            f"list_dot_product(q.qv[{m * sub + 1}:{(m + 1) * sub}], cw{m})"
        )
    slices = ", ".join(
        f"CAST(embedding[{m * sub + 1}:{(m + 1) * sub}] AS DOUBLE[]) AS v{m}"
        for m in range(_PQ_M)
    )
    joins = " ".join(f"JOIN a{m} USING (vec_id)" for m in range(_PQ_M))
    score = " + ".join(score_terms)
    return f"""
WITH sl AS (SELECT vec_id, {slices} FROM embeddings),
{", ".join(with_parts)},
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {_ADC_NQ}
),
scored AS (
  SELECT q.query_id, sl.vec_id AS neighbor_id, {score} AS score
  FROM sl {joins} CROSS JOIN q
  WHERE sl.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id, rank
FROM ranked WHERE rank <= {_ADC_K}"""


ORACLES62["emb_pq_adc_topk"] = _adc_oracle()


QUERIES62 = {
    "nation_flow_matrix": q_nation_flow_matrix,
    "emb_pq_adc_topk": q_emb_pq_adc_topk,
}
