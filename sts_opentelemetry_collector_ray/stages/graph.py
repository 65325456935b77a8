"""Integer PageRank over an edge Dataset — distributed iterative graph rank.

PageRank in EXACT integer arithmetic so the result is order-independent and
byte-replayable in SQL (the float formulation is summation-order-dependent and
can never hash-match an oracle):

    r⁰(v)   = TOTAL // N
    rᵏ⁺¹(v) = (15·TOTAL) // (100·N)  +  (85 · Σ_{(u,v)∈E} (rᵏ(u) // deg(u))) // 100

with TOTAL = 10¹² rank units. Dangling-node mass (outdeg 0) is dropped — the
standard "remove dangling" variant — and the damping split is 85/100 integer
division; both choices are part of the operator's documented contract and the
oracle replays them exactly.

Scale shape (the connected-components pattern, stages/clusters.py): edges are
bucketed ONCE by hash(src) and materialized; each iteration is two BOUNDED
bucket exchanges — (1) *scatter*: rank rows meet their bucket's edges, one
vectorized pandas merge emits (dst, rank//deg) contributions; (2) *gather*:
contributions + zero rows for every node bucket by hash(node), one vectorized
groupby-sum finalizes rᵏ⁺¹ for EVERY node (also the in-degree-0 ones). The
iteration count is fixed; the only driver-side value is N (one int, computed
once). Bucketed pandas merges instead of `Dataset.join` per the CLAUDE.md
empty-block rule."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

TOTAL = 10**12


def _ckpt_load(checkpoint_dir: str, max_round: int, n_nodes: int):
    """Return (completed_round, state Dataset) from a round checkpoint, or
    (0, None). A manifest whose node count mismatches the current graph is
    stale (different input) and is ignored."""
    import json
    import os

    os.makedirs(checkpoint_dir, exist_ok=True)
    manifest = os.path.join(checkpoint_dir, "MANIFEST.json")
    if not os.path.exists(manifest):
        return 0, None
    with open(manifest) as f:
        m = json.load(f)
    if m.get("n_nodes") != n_nodes or not (0 < m.get("round", 0) <= max_round):
        return 0, None
    r = int(m["round"])
    return r, ray.data.read_parquet(
        os.path.join(checkpoint_dir, f"round={r}")
    ).materialize()


def _ckpt_save(checkpoint_dir: str, round_no: int, n_nodes: int, state) -> None:
    """Persist one round: partitioned parquet, then the manifest via atomic
    replace — a crash between the two just re-runs the round."""
    import json
    import os
    import tempfile

    state.write_parquet(os.path.join(checkpoint_dir, f"round={round_no}"))
    fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".manifest")
    with os.fdopen(fd, "w") as f:
        json.dump({"round": round_no, "n_nodes": n_nodes}, f)
    os.replace(tmp, os.path.join(checkpoint_dir, "MANIFEST.json"))


def pagerank_integer(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    num_buckets: int = 32,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    """10-iteration integer PageRank. ``edges`` must be DISTINCT (src, dst)
    pairs; returns (node, rank_int).

    ``checkpoint_dir`` makes the ITERATIVE loop resumable (the north rule's
    checkpoint/lineage contract applied to graph jobs, not just the flagship):
    after every iteration the full rank state is written to
    ``<dir>/round=<k>/`` (partitioned parquet — per-block files, never one
    giant file) and a ``MANIFEST.json`` records the completed round + node
    count. A rerun with the same inputs reads the newest complete round and
    runs ONLY the remaining iterations; integer arithmetic makes the resumed
    result bit-identical to an uninterrupted run (asserted in
    tests/test_graph_checkpoint.py). Crash-safety: the manifest is written
    AFTER the round's parquet completes and replaced atomically (os.replace),
    so a partially-written round is simply re-run."""
    B = np.uint64(num_buckets)

    def hb(a: np.ndarray) -> np.ndarray:
        return (a.astype(np.uint64) % B).astype(np.int32)

    # --- one-time prep: per-src outdegree riding on each edge row ------------
    def edge_rows(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src": t[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                "dst": t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        return df.assign(_b=hb(df["src"].to_numpy()))

    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("src")["dst"].transform("size").astype(np.int64)
        return pd.DataFrame(
            {"src": g["src"], "dst": g["dst"], "deg": deg, "r": np.int64(-1)}
        )

    edges_b = (
        edges.map_batches(edge_rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(attach_deg, batch_format="pandas")
        .map_batches(lambda df: df.assign(_b=hb(df["src"].to_numpy())), batch_format="pandas")
        .materialize()
    )

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()]))
        return pd.DataFrame({"node": n.astype(np.int64)})

    # distinct nodes: per-batch unique → one bounded node-bucket exchange
    nodes = (
        edges_b.map_batches(node_rows, batch_format="pandas")
        .map_batches(lambda df: df.assign(_b=hb(df["node"].to_numpy())), batch_format="pandas")
        .groupby("_b")
        .map_groups(
            lambda g: pd.DataFrame({"node": np.unique(g["node"].to_numpy())}),
            batch_format="pandas",
        )
        .materialize()
    )
    n_nodes = nodes.count()
    base = (15 * TOTAL) // (100 * n_nodes)
    r0 = TOTAL // n_nodes

    zeros = nodes.map_batches(
        lambda df: df.assign(contrib=np.int64(0), _b=hb(df["node"].to_numpy())),
        batch_format="pandas",
    ).materialize()

    ranks = nodes.map_batches(
        lambda df: df.assign(r=np.int64(r0)), batch_format="pandas"
    ).materialize()

    start_round = 0
    if checkpoint_dir is not None:
        start_round, loaded = _ckpt_load(checkpoint_dir, iterations, n_nodes)
        if loaded is not None:
            ranks = loaded

    def rank_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["node"].astype(np.int64),
                "dst": np.int64(-1),
                "deg": np.int64(-1),
                "r": df["r"].astype(np.int64),
                "_b": hb(df["node"].to_numpy()),
            }
        )

    def scatter(g: pd.DataFrame) -> pd.DataFrame:
        is_rank = (g["deg"] < 0).to_numpy()
        rk = g.loc[is_rank, ["src", "r"]].rename(columns={"src": "node"})
        ed = g.loc[~is_rank, ["src", "dst", "deg"]]
        m = ed.merge(rk, left_on="src", right_on="node")
        return pd.DataFrame(
            {
                "node": m["dst"].astype(np.int64),
                "contrib": (m["r"].to_numpy(np.int64) // m["deg"].to_numpy(np.int64)),
            }
        )

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", as_index=False)["contrib"].sum()
        return pd.DataFrame(
            {
                "node": s["node"].astype(np.int64),
                "r": np.int64(base) + (np.int64(85) * s["contrib"].to_numpy(np.int64)) // np.int64(100),
            }
        )

    for k in range(start_round, iterations):
        contribs = (
            edges_b.union(ranks.map_batches(rank_rows, batch_format="pandas"))
            .groupby("_b")
            .map_groups(
                lambda g: scatter(g.drop(columns=["_b"])), batch_format="pandas"
            )
        )
        ranks = (
            contribs.map_batches(
                lambda df: df.assign(_b=hb(df["node"].to_numpy())),
                batch_format="pandas",
            )
            .union(zeros)
            .groupby("_b")
            .map_groups(
                lambda g: gather(g.drop(columns=["_b"])), batch_format="pandas"
            )
            .materialize()
        )
        if checkpoint_dir is not None:
            _ckpt_save(checkpoint_dir, k + 1, n_nodes, ranks)

    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].astype(np.int64), "rank_int": df["r"].astype(np.int64)}
        ),
        batch_format="pandas",
    )


def label_propagation_sync(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
    num_buckets: int = 32,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    """Synchronous label propagation (community detection): labels start as
    node ids; each round EVERY node simultaneously adopts the most frequent
    label among its in-neighbors (ties -> smallest label; no neighbors ->
    keep own). Fixed round count + deterministic tiebreak make the result
    byte-replayable by a chained-CTE SQL oracle (unlike asynchronous LPA,
    whose result depends on visit order). Pass symmetric edges for the
    classic undirected variant.

    Scale shape mirrors ``pagerank_integer``: edges bucket-materialized ONCE
    by hash(src); each round is two BOUNDED bucket exchanges — scatter
    (labels meet their bucket's edges, one vectorized merge emits
    (dst, label) votes) and gather (vote counts -> per-node argmax via one
    sort + drop_duplicates, coalesced with the previous label). Nothing ever
    reaches the driver.

    ``checkpoint_dir`` follows the pagerank_integer contract: per-round label
    state under ``<dir>/round=<k>/`` plus an atomically-replaced
    ``MANIFEST.json``; resume replays only missing rounds, bit-identical
    because the argmax tiebreak is deterministic."""
    B = np.uint64(num_buckets)

    def hb(a: np.ndarray) -> np.ndarray:
        return (a.astype(np.uint64) % B).astype(np.int32)

    def edge_rows(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src": t[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                "dst": t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        return df.assign(lab=np.int64(-1), _b=hb(df["src"].to_numpy()))

    edges_b = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()]))
        return pd.DataFrame({"node": n.astype(np.int64), "_b": hb(n)})

    labels = (
        edges_b.map_batches(node_rows, batch_format="pandas")
        .groupby("_b")
        .map_groups(
            lambda g: pd.DataFrame(
                {"node": (u := np.unique(g["node"].to_numpy())), "lab": u}
            ),
            batch_format="pandas",
        )
        .materialize()
    )

    def label_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["node"].astype(np.int64),
                "dst": np.int64(-1),
                "lab": df["lab"].astype(np.int64),
                "_b": hb(df["node"].to_numpy()),
            }
        )

    def scatter(g: pd.DataFrame) -> pd.DataFrame:
        is_lab = (g["dst"] < 0).to_numpy()
        lb = g.loc[is_lab, ["src", "lab"]].rename(columns={"src": "node"})
        ed = g.loc[~is_lab, ["src", "dst"]]
        m = ed.merge(lb, left_on="src", right_on="node")
        return pd.DataFrame(
            {"node": m["dst"].astype(np.int64), "vote": m["lab"].astype(np.int64)}
        )

    def own_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"].astype(np.int64),
                "vote": np.int64(-1),
                "own": df["lab"].astype(np.int64),
                "_b": hb(df["node"].to_numpy()),
            }
        )

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        is_own = (g["vote"] < 0).to_numpy()
        own = g.loc[is_own, ["node", "own"]]
        votes = g.loc[~is_own, ["node", "vote"]]
        c = (
            votes.groupby(["node", "vote"], sort=False)
            .size()
            .rename("c")
            .reset_index()
            .sort_values(["node", "c", "vote"], ascending=[True, False, True],
                         kind="mergesort")
            .drop_duplicates("node")
        )
        m = own.merge(c[["node", "vote"]], on="node", how="left")
        lab = m["vote"].fillna(m["own"]).astype(np.int64)
        return pd.DataFrame({"node": m["node"].astype(np.int64), "lab": lab})

    start_round = 0
    if checkpoint_dir is not None:
        n_nodes = labels.count()
        start_round, loaded = _ckpt_load(checkpoint_dir, rounds, n_nodes)
        if loaded is not None:
            labels = loaded

    for _k in range(start_round, rounds):
        votes = (
            edges_b.union(labels.map_batches(label_rows, batch_format="pandas"))
            .groupby("_b")
            .map_groups(
                lambda g: scatter(g.drop(columns=["_b"])), batch_format="pandas"
            )
            .map_batches(
                lambda df: df.assign(own=np.int64(-1), _b=hb(df["node"].to_numpy())),
                batch_format="pandas",
            )
        )
        labels = (
            votes.union(labels.map_batches(own_rows, batch_format="pandas"))
            .groupby("_b")
            .map_groups(
                lambda g: gather(g.drop(columns=["_b"])), batch_format="pandas"
            )
            .materialize()
        )
        if checkpoint_dir is not None:
            _ckpt_save(checkpoint_dir, _k + 1, n_nodes, labels)

    return labels.map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df["node"].astype(np.int64),
                "community": df["lab"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
