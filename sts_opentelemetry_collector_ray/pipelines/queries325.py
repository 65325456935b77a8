"""Driver-contract queries, wave 325 — kNN-graph reciprocity of the
bounded embedding sample (mutual-neighbor rate, an ANN index-quality
signal) and two-hop brokerage on the directed nation trade graph (pairs
connected ONLY through a broker — the structural-holes view). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES325: dict[str, str] = {}

_KR_MAX_ID = 256
_KR_K = 5


# ---------------------------------------------------------------------------
# emb_knn_reciprocity — mutual-neighbor rate of the cosine kNN graph
# ---------------------------------------------------------------------------


def q_emb_knn_reciprocity(sf_dir: str):
    """kNN reciprocity on the vec_id < 256 sample: each vector's k = 5
    cosine nearest neighbors (bit-exact sequential dots; ties broken by
    smaller vec_id), and the share of directed edges whose reverse edge
    also exists. Hub-dominated spaces have low reciprocity. One row:
    n_nodes, k, n_edges, n_mutual, reciprocity_micro."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], _KR_MAX_ID))

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    cols = ["n_nodes", "k", "n_edges", "n_mutual", "reciprocity_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(t)
    if n <= _KR_K:
        return empty
    ids = t["vec_id"].to_numpy(np.int64)
    from ..functions.vectors import stack_list_column

    v = stack_list_column(t["embedding"], np.float64)
    d = v.shape[1]
    norms2 = np.zeros(n)
    dots = np.zeros((n, n))
    for j in range(d):
        norms2 = norms2 + v[:, j] * v[:, j]
        dots = dots + v[:, j][:, None] * v[None, :, j]
    # single division by the norm PRODUCT — bit-mirrors the oracle's
    # dot / (sqrt(na) * sqrt(nb)) so near-tie ranks agree
    cosm = dots / (np.sqrt(norms2)[:, None] * np.sqrt(norms2)[None, :])
    edges: set[tuple[int, int]] = set()
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-cosm[i, j], ids[j]),
        )[:_KR_K]
        for j in order:
            edges.add((int(ids[i]), int(ids[j])))
    n_edges = len(edges)
    n_mutual = sum(1 for a, b in edges if (b, a) in edges)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(_KR_K), np.int64(n_edges),
                np.int64(n_mutual),
                np.int64(np.floor(
                    float(n_mutual) / float(n_edges) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES325["emb_knn_reciprocity"] = f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {_KR_MAX_ID}
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cosv
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY cosv DESC, dst)
           AS rk
  FROM pairs
),
edges AS (SELECT src, dst FROM ranked WHERE rk <= {_KR_K}),
mut AS (
  SELECT CAST(count(*) AS BIGINT) AS m
  FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS e FROM edges)
SELECT nn.n AS n_nodes, CAST({_KR_K} AS BIGINT) AS k, ne.e AS n_edges,
       mut.m AS n_mutual,
       CAST(floor(CAST(mut.m AS DOUBLE) / CAST(ne.e AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS reciprocity_micro
FROM nn, ne, mut
WHERE nn.n > {_KR_K} AND ne.e > 0"""


# ---------------------------------------------------------------------------
# nation_two_hop_brokerage — structural holes in the trade graph
# ---------------------------------------------------------------------------


def q_nation_two_hop_brokerage(sf_dir: str):
    """Brokerage: for each nation v, the number of ordered pairs (s, t)
    with s != t != v such that s->v and v->t exist but the direct edge
    s->t does NOT — pairs that can only trade THROUGH v. Pure integer
    counting on the bounded flow matrix. Per nation: nation,
    n_broker_pairs, in_deg, out_deg, share_micro (of all brokered pairs
    corpus-wide).

    Scale shape: the tagged count exchange; the |nations|^3 scan runs
    on the bounded driver matrix."""
    import ray as _ray
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
    dims_ref = _ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "cust": np.int64(-1),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = _ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp"]]
        m = li.merge(o, on="k")
        s = m["supp"].map(s2n_).to_numpy(np.int64)
        c = m["cust"].map(c2n_).to_numpy(np.int64)
        keep = s != c
        return (
            pd.DataFrame({"s": s[keep], "c": c[keep]})
            .drop_duplicates()
            .astype(np.int64)
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    e = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["nation", "n_broker_pairs", "in_deg", "out_deg", "share_micro"]
    empty = pd.DataFrame(
        {
            "nation": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if e.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    edge_set = set(zip(e["s"].tolist(), e["c"].tolist()))
    nodes = sorted({k for pair in edge_set for k in pair})
    preds = {v: [s for s in nodes if (s, v) in edge_set] for v in nodes}
    succs = {v: [t for t in nodes if (v, t) in edge_set] for v in nodes}
    rows = []
    total = 0
    per = {}
    for v in nodes:
        cnt = 0
        for s in preds[v]:
            for t in succs[v]:
                if s != t and s != v and t != v and (s, t) not in edge_set:
                    cnt += 1
        per[v] = cnt
        total += cnt
    if total == 0:
        return empty
    for v in nodes:
        rows.append(
            (
                names[v], np.int64(per[v]), np.int64(len(preds[v])),
                np.int64(len(succs[v])),
                np.int64(np.floor(
                    float(per[v]) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("nation")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )


ORACLES325["nation_two_hop_brokerage"] = """
WITH e AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e
                                  UNION ALL SELECT dst FROM e)),
brok AS (
  SELECT i.dst AS v, CAST(count(*) AS BIGINT) AS n
  FROM e i JOIN e o2 ON o2.src = i.dst
  WHERE i.src <> o2.dst AND i.src <> i.dst AND o2.dst <> o2.src
    AND NOT EXISTS (
      SELECT 1 FROM e d WHERE d.src = i.src AND d.dst = o2.dst
    )
  GROUP BY 1
),
deg AS (
  SELECT n.v,
         CAST(coalesce((SELECT count(*) FROM e WHERE e.dst = n.v), 0)
              AS BIGINT) AS ind,
         CAST(coalesce((SELECT count(*) FROM e WHERE e.src = n.v), 0)
              AS BIGINT) AS outd
  FROM nodes n
),
tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t FROM brok)
SELECT na.n_name AS nation,
       CAST(coalesce(brok.n, 0) AS BIGINT) AS n_broker_pairs,
       deg.ind AS in_deg, deg.outd AS out_deg,
       CAST(floor(CAST(coalesce(brok.n, 0) AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro
FROM deg
LEFT JOIN brok ON brok.v = deg.v
JOIN nation na ON na.n_nationkey = deg.v, tot
WHERE tot.t > 0
ORDER BY nation"""


QUERIES325 = {
    "emb_knn_reciprocity": q_emb_knn_reciprocity,
    "nation_two_hop_brokerage": q_nation_two_hop_brokerage,
}
