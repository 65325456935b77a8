"""Driver-contract queries, wave 395 — PageRank (damping 0.85, 20
iterations) and HITS hubs/authorities (10 L1-normalized iterations)
on the weighted directed nation trade graph (supplier nation ->
customer nation, off-diagonal lineitem counts). All float folds run in
node/edge order on both sides; iteration counts are fixed so the SQL
oracle unrolls them. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES395: dict[str, str] = {}

_TG_BUCKETS = 64
_PR_D = 0.85
_PR_ITERS = 20
_HITS_ITERS = 10

_EDGES_SQL = """
edges AS MATERIALIZED (
  SELECT s.s_nationkey AS s, c.c_nationkey AS c,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT v FROM (
    SELECT s AS v FROM edges UNION ALL SELECT c FROM edges
  )
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
outw AS MATERIALIZED (
  SELECT s AS v, CAST(sum(w) AS BIGINT) AS o FROM edges GROUP BY 1
)"""


def _trade_edges(sf_dir: str) -> pd.DataFrame:
    """Directed (s_nation, c_nation, weight) edge list via the tagged
    orderkey-bucket exchange (pattern of queries275)."""
    import pyarrow.parquet as pq_mod

    import ray as _ray

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(),
                   cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(),
                   supp["s_nationkey"].to_pylist()))
    dims_ref = _ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "cust": np.int64(-1),
                "_b": (k % _TG_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _TG_BUCKETS).astype(np.int64),
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
        out = (
            pd.DataFrame({"s": s[keep], "c": c[keep]})
            .groupby(["s", "c"], sort=False)
            .size()
            .rename("w")
            .reset_index()
        )
        out["w"] = out["w"].astype(np.int64)
        return out

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    return (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["s", "c"])["w"]
        .sum()
        .reset_index()
    )


# ---------------------------------------------------------------------------
# nation_trade_pagerank
# ---------------------------------------------------------------------------


def q_nation_trade_pagerank(sf_dir: str):
    """PageRank on the trade graph: 20 iterations of
    r'(v) = (1-d)/n + d * (sum_{u->v} r(u) w(u,v)/out(u) + D/n) with
    D the dangling mass; incoming folds per v in source order, the
    dangling fold in node order. Per nation: nationkey, pr_micro."""

    edges = _trade_edges(sf_dir)
    cols = ["nationkey", "pr_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if edges.empty:
        return empty
    nodes = sorted(
        set(int(x) for x in edges["s"]) | set(int(x) for x in edges["c"])
    )
    n = len(nodes)
    outw = edges.groupby("s")["w"].sum()
    incoming = {
        v: sorted(
            (int(r["s"]), int(r["w"]))
            for _, r in edges[edges["c"] == v].iterrows()
        )
        for v in nodes
    }
    r = {v: 1.0 / float(n) for v in nodes}
    for _ in range(_PR_ITERS):
        dang = 0.0
        for v in nodes:
            if int(outw.get(v, 0)) == 0:
                dang = dang + r[v]
        new = {}
        for v in nodes:
            acc = 0.0
            for u, w in incoming[v]:
                acc = acc + r[u] * float(w) / float(int(outw[u]))
            new[v] = (1.0 - _PR_D) / float(n) + _PR_D * (
                acc + dang / float(n)
            )
        r = new
    return pd.DataFrame(
        [
            (np.int64(v),
             np.int64(np.floor(r[v] * 1_000_000.0 + 0.5)))
            for v in nodes
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _pr_iter_sql(i: int) -> str:
    return f"""
inc{i} AS MATERIALIZED (
  SELECT e.c AS v,
         list_reduce(list_prepend(0.0,
           list(r.r * CAST(e.w AS DOUBLE) / ow.o ORDER BY e.s)),
           (a, b) -> a + b) AS s
  FROM edges e
  JOIN rk{i} r ON r.v = e.s
  JOIN outw ow ON ow.v = e.s
  GROUP BY 1
),
dang{i} AS MATERIALIZED (
  SELECT coalesce(list_reduce(list_prepend(0.0,
           list(r.r ORDER BY r.v)), (a, b) -> a + b), 0.0) AS ds
  FROM rk{i} r LEFT JOIN outw ON outw.v = r.v
  WHERE outw.v IS NULL
),
rk{i + 1} AS MATERIALIZED (
  SELECT nodes.v,
         (1.0 - {_PR_D}) / nn.n
           + {_PR_D} * (coalesce(inc{i}.s, 0.0) + dang{i}.ds / nn.n)
           AS r
  FROM nodes LEFT JOIN inc{i} ON inc{i}.v = nodes.v, nn, dang{i}
)"""


ORACLES395["nation_trade_pagerank"] = (
    "WITH "
    + _EDGES_SQL.lstrip()
    + """,
rk0 AS MATERIALIZED (SELECT v, 1.0 / nn.n AS r FROM nodes, nn),
"""
    + ",\n".join(_pr_iter_sql(i) for i in range(_PR_ITERS))
    + f"""
SELECT CAST(v AS BIGINT) AS nationkey,
       CAST(floor(r * 1000000.0 + 0.5) AS BIGINT) AS pr_micro
FROM rk{_PR_ITERS}
ORDER BY nationkey"""
)


# ---------------------------------------------------------------------------
# nation_trade_hits
# ---------------------------------------------------------------------------


def q_nation_trade_hits(sf_dir: str):
    """HITS on the trade graph: 10 iterations of a <- E^T h, h <- E a
    with L1 normalization after each half-step (all folds in node /
    edge order). Per nation: nationkey, hub_micro, auth_micro."""

    edges = _trade_edges(sf_dir)
    cols = ["nationkey", "hub_micro", "auth_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if edges.empty:
        return empty
    nodes = sorted(
        set(int(x) for x in edges["s"]) | set(int(x) for x in edges["c"])
    )
    n = len(nodes)
    incoming = {
        v: sorted(
            (int(r["s"]), int(r["w"]))
            for _, r in edges[edges["c"] == v].iterrows()
        )
        for v in nodes
    }
    outgoing = {
        v: sorted(
            (int(r["c"]), int(r["w"]))
            for _, r in edges[edges["s"] == v].iterrows()
        )
        for v in nodes
    }
    h = {v: 1.0 / float(n) for v in nodes}
    a = {v: 1.0 / float(n) for v in nodes}
    for _ in range(_HITS_ITERS):
        raw_a = {}
        for v in nodes:
            acc = 0.0
            for u, w in incoming[v]:
                acc = acc + h[u] * float(w)
            raw_a[v] = acc
        asum = 0.0
        for v in nodes:
            asum = asum + raw_a[v]
        if asum <= 0.0:
            return empty
        a = {v: raw_a[v] / asum for v in nodes}
        raw_h = {}
        for v in nodes:
            acc = 0.0
            for c_, w in outgoing[v]:
                acc = acc + a[c_] * float(w)
            raw_h[v] = acc
        hsum = 0.0
        for v in nodes:
            hsum = hsum + raw_h[v]
        if hsum <= 0.0:
            return empty
        h = {v: raw_h[v] / hsum for v in nodes}
    return pd.DataFrame(
        [
            (
                np.int64(v),
                np.int64(np.floor(h[v] * 1_000_000.0 + 0.5)),
                np.int64(np.floor(a[v] * 1_000_000.0 + 0.5)),
            )
            for v in nodes
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _hits_iter_sql(i: int) -> str:
    return f"""
rawa{i} AS MATERIALIZED (
  SELECT nodes.v,
         coalesce((SELECT list_reduce(list_prepend(0.0,
             list(hh.h * CAST(e.w AS DOUBLE) ORDER BY e.s)),
             (x, y) -> x + y)
           FROM edges e JOIN hub{i} hh ON hh.v = e.s
           WHERE e.c = nodes.v), 0.0) AS r
  FROM nodes
),
asum{i} AS MATERIALIZED (
  SELECT list_reduce(list_prepend(0.0, list(r ORDER BY v)),
                     (x, y) -> x + y) AS s
  FROM rawa{i}
),
auth{i + 1} AS MATERIALIZED (
  SELECT rawa{i}.v, rawa{i}.r / asum{i}.s AS a FROM rawa{i}, asum{i}
),
rawh{i} AS MATERIALIZED (
  SELECT nodes.v,
         coalesce((SELECT list_reduce(list_prepend(0.0,
             list(aa.a * CAST(e.w AS DOUBLE) ORDER BY e.c)),
             (x, y) -> x + y)
           FROM edges e JOIN auth{i + 1} aa ON aa.v = e.c
           WHERE e.s = nodes.v), 0.0) AS r
  FROM nodes
),
hsum{i} AS MATERIALIZED (
  SELECT list_reduce(list_prepend(0.0, list(r ORDER BY v)),
                     (x, y) -> x + y) AS s
  FROM rawh{i}
),
hub{i + 1} AS MATERIALIZED (
  SELECT rawh{i}.v, rawh{i}.r / hsum{i}.s AS h FROM rawh{i}, hsum{i}
)"""


ORACLES395["nation_trade_hits"] = (
    "WITH "
    + _EDGES_SQL.lstrip()
    + """,
hub0 AS MATERIALIZED (SELECT v, 1.0 / nn.n AS h FROM nodes, nn),
"""
    + ",\n".join(_hits_iter_sql(i) for i in range(_HITS_ITERS))
    + f"""
SELECT CAST(nodes.v AS BIGINT) AS nationkey,
       CAST(floor(hub{_HITS_ITERS}.h * 1000000.0 + 0.5) AS BIGINT)
         AS hub_micro,
       CAST(floor(auth{_HITS_ITERS}.a * 1000000.0 + 0.5) AS BIGINT)
         AS auth_micro
FROM nodes
JOIN hub{_HITS_ITERS} ON hub{_HITS_ITERS}.v = nodes.v
JOIN auth{_HITS_ITERS} ON auth{_HITS_ITERS}.v = nodes.v
ORDER BY nationkey"""
)


QUERIES395 = {
    "nation_trade_pagerank": q_nation_trade_pagerank,
    "nation_trade_hits": q_nation_trade_hits,
}
