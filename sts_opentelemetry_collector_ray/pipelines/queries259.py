"""Driver-contract queries, wave 259 — harmonic centrality over the
cross-nation trade graph (all-pairs BFS on the bounded nation vertex set,
EXACT via the lcm(1..24) scaling so reciprocal-distance sums are integer)
and the exact decision-stump learner: the best Gini-impurity split of
discount basis-points predicting returned lineitems. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES259: dict[str, str] = {}

_HC_BUCKETS = 64
_HC_MAX_D = 24  # diameter bound for a ≤25-node graph
_HC_L = math.lcm(*range(1, _HC_MAX_D + 1))  # 5354228880, exact 1/d scaling


# ---------------------------------------------------------------------------
# nation_harmonic_centrality — all-pairs BFS over the trade graph
# ---------------------------------------------------------------------------


def q_nation_harmonic_centrality(sf_dir: str):
    """Harmonic centrality h(v) = Σ_{u reachable} 1/d(v,u) on the
    UNDIRECTED nation trade graph: an edge (a,b) exists iff some lineitem
    ships from a supplier in b to a customer in a (a ≠ b). Reciprocal
    distances are made EXACT integers by scaling with L = lcm(1..24)
    (every BFS distance on ≤25 vertices divides L), so both sides sum
    ints and divide once. Per nation: n_reach, h_num (Σ L/d), h_micro.

    Scale shape: the lineitem×orders custkey resolution is ONE tagged
    orderkey-bucket exchange (the `nation_flow_matrix` pattern); only
    DISTINCT (nation,nation) pairs leave the buckets; BFS runs on the
    bounded |nations| graph on the driver. SQL replays it as a recursive
    CTE bounded by d < 24."""
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
    dims_ref = ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "cust": np.int64(-1),
                "_b": (k % _HC_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _HC_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp"]]
        m = li.merge(o, on="k")
        a = m["cust"].map(c2n_).to_numpy(np.int64)
        b = m["supp"].map(s2n_).to_numpy(np.int64)
        keep = a != b
        return (
            pd.DataFrame({"a": a[keep], "b": b[keep]})
            .drop_duplicates()
            .astype(np.int64)
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    pairs = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |nations|² distinct pairs per bucket
        .drop_duplicates()
    )
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["a"].to_numpy(), pairs["b"].to_numpy()):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    rows = []
    for v in sorted(names):
        dist = {v: 0}
        frontier = [v]
        d = 0
        while frontier and d < _HC_MAX_D:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        h_num = sum(_HC_L // dd for u, dd in dist.items() if dd > 0)
        n_reach = len(dist) - 1
        h = float(h_num) / float(_HC_L)
        rows.append(
            (
                names[v],
                np.int64(n_reach),
                np.int64(h_num),
                np.int64(np.floor(h * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(
        rows, columns=["nation", "n_reach", "h_num", "h_micro"]
    ).astype({"n_reach": np.int64, "h_num": np.int64, "h_micro": np.int64})


ORACLES259["nation_harmonic_centrality"] = f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
e AS (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
paths(src, dst, d) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT p.src, e.dst, p.d + 1
  FROM paths p JOIN e ON e.src = p.dst
  WHERE p.d < {_HC_MAX_D} AND e.dst <> p.src
),
sp AS (SELECT src, dst, min(d) AS d FROM paths GROUP BY 1, 2),
h AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_reach,
         CAST(sum({_HC_L} // d) AS BIGINT) AS h_num
  FROM sp GROUP BY src
)
SELECT n.n_name AS nation,
       coalesce(h.n_reach, 0) AS n_reach,
       coalesce(h.h_num, 0) AS h_num,
       CAST(floor(CAST(coalesce(h.h_num, 0) AS DOUBLE)
                  / CAST({_HC_L} AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS h_micro
FROM nation n LEFT JOIN h ON h.src = n.n_nationkey
ORDER BY nation"""


# ---------------------------------------------------------------------------
# lineitem_stump_split — exact best Gini decision stump on discount
# ---------------------------------------------------------------------------


def q_lineitem_stump_split(sf_dir: str):
    """Exact decision-stump learner: the discount basis-point threshold
    (left = rows with bp ≤ t) minimizing the size-weighted Gini impurity
    of predicting l_returnflag = 'R'. Impurity uses exact integer counts
    with ONE mirrored float expression per candidate:
    g = ((nl − (pl²+(nl−pl)²)/nl) + (nr − (pr²+(nr−pr)²)/nr)) / n.
    Ties break to the smallest threshold AFTER micro-rounding (integer
    comparison — no float-order ambiguity). One row: thresh_bp, n_left,
    n_right, pos_left, pos_right, gini_micro.

    Scale shape: per-batch (bp → count,pos) combiner; only the ≤|distinct
    bp| partial table reaches the driver; the threshold scan is a
    prefix-sum over that bounded table."""

    def partial(t: pa.Table) -> pd.DataFrame:
        bp = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pos = (
            t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        df = pd.DataFrame({"bp": bp, "pos": pos})
        out = df.groupby("bp", as_index=False).agg(
            n=("pos", "size"), p=("pos", "sum")
        )
        return out.astype({"n": np.int64, "p": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |distinct basis points| rows per batch
        .groupby("bp")
        .agg(n=("n", "sum"), p=("p", "sum"))
        .sort_index()
    )
    cols = [
        "thresh_bp", "n_left", "n_right", "pos_left", "pos_right", "gini_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    n_tot = int(part["n"].sum())
    p_tot = int(part["p"].sum())
    nl = np.cumsum(part["n"].to_numpy(np.int64))
    pl = np.cumsum(part["p"].to_numpy(np.int64))
    bp = part.index.to_numpy(np.int64)
    nr = n_tot - nl
    pr = p_tot - pl
    keep = (nl > 0) & (nr > 0)
    if not keep.any():
        return empty
    bp, nl, pl, nr, pr = bp[keep], nl[keep], pl[keep], nr[keep], pr[keep]
    nl_f = nl.astype(np.float64)
    nr_f = nr.astype(np.float64)
    a = nl_f - (pl * pl + (nl - pl) * (nl - pl)).astype(np.float64) / nl_f
    b = nr_f - (pr * pr + (nr - pr) * (nr - pr)).astype(np.float64) / nr_f
    g = (a + b) / np.float64(n_tot)
    gmic = np.floor(g * 1_000_000.0 + 0.5).astype(np.int64)
    order = np.lexsort((bp, gmic))
    i = order[0]
    return pd.DataFrame(
        {
            "thresh_bp": [np.int64(bp[i])],
            "n_left": [np.int64(nl[i])],
            "n_right": [np.int64(nr[i])],
            "pos_left": [np.int64(pl[i])],
            "pos_right": [np.int64(pr[i])],
            "gini_micro": [np.int64(gmic[i])],
        }
    )


ORACLES259["lineitem_stump_split"] = """
WITH b AS (
  SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS bp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS p
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS p FROM b),
cum AS (
  SELECT bp,
         CAST(sum(n) OVER (ORDER BY bp) AS BIGINT) AS nl,
         CAST(sum(p) OVER (ORDER BY bp) AS BIGINT) AS pl
  FROM b
),
cand AS (
  SELECT bp, nl, pl, tot.n - nl AS nr, tot.p - pl AS pr, tot.n AS n_tot
  FROM cum, tot WHERE nl > 0 AND tot.n - nl > 0
),
sc AS (
  SELECT bp, nl, nr, pl, pr,
         CAST(floor((
           (CAST(nl AS DOUBLE)
            - CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE)
              / CAST(nl AS DOUBLE))
           + (CAST(nr AS DOUBLE)
              - CAST(pr * pr + (nr - pr) * (nr - pr) AS DOUBLE)
                / CAST(nr AS DOUBLE))
         ) / CAST(n_tot AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS gini_micro
  FROM cand
)
SELECT bp AS thresh_bp, nl AS n_left, nr AS n_right,
       pl AS pos_left, pr AS pos_right, gini_micro
FROM sc ORDER BY gini_micro, bp LIMIT 1"""


QUERIES259 = {
    "nation_harmonic_centrality": q_nation_harmonic_centrality,
    "lineitem_stump_split": q_lineitem_stump_split,
}
