"""Driver-contract queries, wave 33 — distributed triangle counting (the
second iterative-graph operator after PageRank: degree-oriented node-iterator,
Schank & Wagner 2005) and a TPC-H Q6-shaped selective scan whose predicates
push into the parquet read (row-group pruning). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES33: dict[str, str] = {}

_TRI_ORDER_BUCKETS = 64  # co-occurrence enumeration buckets (orders co-locate)
_TRI_EDGE_BUCKETS = 64  # edge-dedup / wedge-closure buckets
_TRI_NODE_BUCKETS = 32  # wedge-generation buckets (sources co-locate)


def _pair_bucket(a: np.ndarray, b: np.ndarray, nb: int) -> np.ndarray:
    """Deterministic pair→bucket hash (golden-ratio multiply ⊕ second key)."""
    return (
        ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64))
        % np.uint64(nb)
    ).astype(np.int32)


# ---------------------------------------------------------------------------
# graph_triangles — exact triangle count over the order→part co-occurrence graph
# ---------------------------------------------------------------------------


def q_graph_triangles(sf_dir: str):
    """Exact triangle counting by the degree-oriented node-iterator (Schank &
    Wagner 2005; MapReduce form: Suri & Vassilvitskii 2011): orient each edge
    from its lower-(degree, id) endpoint so every out-adjacency is O(sqrt E)
    even on skewed graphs, enumerate wedges per source, close them against the
    oriented edge set.

    Pipeline shape (each exchange bounded; pairs never congregate driver-side):
    1. distinct (order, part) per batch → ONE order-bucket exchange →
       per-bucket lag-loop pair enumeration (the basket_pairs idiom);
    2. pair-hash bucket exchange → per-bucket distinct = the edge set,
       materialized ONCE (E rows of 16 B) so the two consumers below never
       re-execute upstream (the no-lazy-branching rule);
    3. degrees from (node, count) block partials — the vertex set is
       dimension-sized (parts), so the driver folds ≤ nodes×blocks rows and
       broadcasts a sorted rank array (searchsorted lookup, no dicts);
       corpus-sized vertex sets would swap this broadcast for two bucketed
       degree joins (documented partitioning assumption);
    4. wedge generation per source bucket (vectorized lag loop over oriented
       adjacency, max lag = max out-degree ≤ O(sqrt E));
    5. closure: wedges (kind 0) UNION oriented edges (kind 1) share a
       pair-hash bucket exchange; one vectorized isin per bucket counts
       closures. Driver residue: one scalar per bucket.

    Output: one row — n_nodes, n_edges, triangles (all BIGINT)."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/lineitem.parquet"

    # -- stage 1: per-order distinct items, bucketed by order ----------------
    def items_partial(t: pa.Table) -> pa.Table:
        df = t.select(["l_orderkey", "l_partkey"]).to_pandas().drop_duplicates()
        df["_b"] = (df["l_orderkey"].to_numpy() % _TRI_ORDER_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort"
        )
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        us, vs = [], []
        # bounded lag loop: max lag = max items per order (basket_pairs idiom)
        _, counts = np.unique(ok, return_counts=True)
        for lag in range(1, int(counts.max()) if len(counts) else 1):
            same = ok[lag:] == ok[:-lag]
            if not same.any():
                break
            us.append(pk[:-lag][same])
            vs.append(pk[lag:][same])
        if not us:
            return pd.DataFrame(
                {
                    "u": np.array([], np.int64),
                    "v": np.array([], np.int64),
                    "_eb": np.array([], np.int32),
                }
            )
        out = pd.DataFrame(
            {"u": np.concatenate(us), "v": np.concatenate(vs)}
        ).drop_duplicates()
        out["_eb"] = _pair_bucket(
            out["u"].to_numpy(), out["v"].to_numpy(), _TRI_EDGE_BUCKETS
        )
        return out

    edges = (
        ray.data.read_parquet(path, columns=["l_orderkey", "l_partkey"])
        .map_batches(items_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(order_pairs, batch_format="pandas")
        .groupby("_eb")
        .map_groups(
            lambda g: g.drop(columns=["_eb"]).drop_duplicates(),
            batch_format="pandas",
        )
        .materialize()  # E rows × 16 B, consumed by degrees + orientation
    )
    n_edges = edges.count()

    # -- stage 2: degree fold (dimension-sized vertex set) + rank broadcast --
    def degree_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
            ]
        )
        nodes, cnt = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(nodes), "cnt": pa.array(cnt.astype(np.int64))}
        )

    degp = edges.map_batches(degree_partial, batch_format="pyarrow").to_pandas()
    deg = degp.groupby("node")["cnt"].sum().sort_index()
    nodes_sorted = deg.index.to_numpy()  # sorted node ids
    degs = deg.to_numpy()
    n_nodes = len(nodes_sorted)
    # orientation rank: (degree, id) lexicographic, encoded deg·2^32 + id
    rank_of_node = degs.astype(np.uint64) * np.uint64(1 << 32) + nodes_sorted.astype(
        np.uint64
    )

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        ur = rank_of_node[np.searchsorted(nodes_sorted, u)]
        vr = rank_of_node[np.searchsorted(nodes_sorted, v)]
        lo = ur < vr
        src = np.where(lo, u, v)
        src_r = np.where(lo, ur, vr)
        dst_r = np.where(lo, vr, ur)
        return pa.table(
            {
                "src": pa.array(src),
                "src_r": pa.array(src_r),
                "dst_r": pa.array(dst_r),
                "_nb": pa.array(
                    (src.astype(np.uint64) % _TRI_NODE_BUCKETS).astype(np.int32)
                ),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow").materialize()

    # -- stage 3: wedge generation per source bucket -------------------------
    def gen_wedges(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["src", "dst_r"], kind="mergesort")
        s = d["src"].to_numpy()
        t_ = d["dst_r"].to_numpy(dtype=np.uint64)
        parts_a, parts_b = [], []
        _, counts = np.unique(s, return_counts=True)
        for lag in range(1, int(counts.max()) if len(counts) else 1):
            same = s[lag:] == s[:-lag]
            if not same.any():
                break
            parts_a.append(t_[:-lag][same])
            parts_b.append(t_[lag:][same])
        if not parts_a:
            return pd.DataFrame(
                {
                    "a": np.array([], np.uint64),
                    "b": np.array([], np.uint64),
                    "kind": np.array([], np.int8),
                    "_cb": np.array([], np.int32),
                }
            )
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        return pd.DataFrame(
            {
                "a": a,
                "b": b,
                "kind": np.zeros(len(a), dtype=np.int8),
                "_cb": _pair_bucket(a, b, _TRI_EDGE_BUCKETS),
            }
        )

    wedges = (
        oriented.groupby("_nb").map_groups(gen_wedges, batch_format="pandas")
    )

    def edge_pairs(d: pd.DataFrame) -> pd.DataFrame:
        a = d["src_r"].to_numpy(dtype=np.uint64)
        b = d["dst_r"].to_numpy(dtype=np.uint64)
        # pandas blocks on purpose: the union below needs one block type
        return pd.DataFrame(
            {
                "a": a,
                "b": b,
                "kind": np.ones(len(a), dtype=np.int8),
                "_cb": _pair_bucket(a, b, _TRI_EDGE_BUCKETS),
            }
        )

    tagged_edges = oriented.map_batches(edge_pairs, batch_format="pandas")

    # -- stage 4: closure per pair bucket ------------------------------------
    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 1]
        w = g[g["kind"] == 0]
        if not len(e) or not len(w):
            return pd.DataFrame({"tri": np.array([0], np.int64)})
        # pack (a,b) into one uint64 key impossible (both 64-bit) — use a
        # vectorized merge on the two columns instead
        m = w[["a", "b"]].merge(
            e[["a", "b"]].drop_duplicates(), on=["a", "b"], how="inner"
        )
        return pd.DataFrame({"tri": np.array([len(m)], np.int64)})

    tri_parts = (
        wedges.union(tagged_edges)
        .groupby("_cb")
        .map_groups(close_bucket, batch_format="pandas")
        .to_pandas()  # bounded: one scalar per bucket
    )
    triangles = int(tri_parts["tri"].sum())

    return pd.DataFrame(
        {
            "n_nodes": np.array([n_nodes], dtype=np.int64),
            "n_edges": np.array([n_edges], dtype=np.int64),
            "triangles": np.array([triangles], dtype=np.int64),
        }
    )


ORACLES33["graph_triangles"] = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*) FROM edges e1
          JOIN edges e2 ON e1.v = e2.u
          JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS triangles"""


# ---------------------------------------------------------------------------
# q6_selective_scan — predicate-pushdown scan + exact-integer aggregate
# ---------------------------------------------------------------------------


def q_q6_selective_scan(sf_dir: str):
    """TPC-H Q6 shape (forecast-revenue-change): ALL predicates push into the
    parquet scan via `filter=` (row-group stats prune shipdate/discount/
    quantity ranges before any byte decodes — the read-level pruning the 100 TB
    brief demands), columns prune to the two aggregated fields, and revenue
    accumulates in exact integer cents×basis-points (order-independent int64;
    no float-sum nondeterminism). Driver residue: one (n, rev) pair per block."""
    import pyarrow.dataset as pads

    flt = (
        (
            pads.field("l_shipdate")
            >= pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
        )
        & (
            pads.field("l_shipdate")
            < pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        )
        & (pads.field("l_discount") >= 0.03)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )

    def partial(t: pa.Table) -> pa.Table:
        px = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(px * 100.0 + 0.5).astype(np.int64)
        bp = np.floor(dc * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([np.int64(len(t))]),
                "rev": pa.array([np.int64((cents * bp).sum())]),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_discount"],
            filter=flt,
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one row per block
    )
    return pd.DataFrame(
        {
            "n": np.array([parts["n"].sum()], dtype=np.int64),
            "rev": np.array([parts["rev"].sum()], dtype=np.int64),
        }
    )


ORACLES33["q6_selective_scan"] = """
SELECT count(*) AS n,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""


QUERIES33 = {
    "graph_triangles": q_graph_triangles,
    "q6_selective_scan": q_q6_selective_scan,
}
