"""Near-dup cluster resolution + gap-based sessionization.

`connected_components` closes the near-dup loop (shingle → minhash → band →
candidate pairs → VERIFY → components): distributed min-label propagation — each
round a node adopts the smallest id among itself and its neighbors via a
`groupby(node).min` exchange; converges in O(cluster diameter) rounds. Diameters
of near-dup clusters are tiny (they are quasi-cliques), so a handful of rounds
suffices; the pair set is ≪ the corpus, so every round is a small shuffle
(guide pattern: "iterate a few rounds of min-label propagation with groupby").

`sessionize` is the event-stream windowing operator (gap-based session windows
per user) — implemented as the usual conv/user-bucket exchange + vectorized
pandas inside each bucket; the ordering assumption (sortable ts within user) is
the same per-key contract as the flagship pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Min


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 10,
) -> pd.DataFrame:
    """(node, component) for every node in the pair graph; component = min node id
    reachable. Runs ≤ max_rounds label-propagation shuffles, stopping early when a
    round changes nothing."""
    df = pairs.to_pandas()
    # an empty Dataset loses its schema through to_pandas — treat as no edges
    if df.empty or a_col not in df.columns:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "component": pd.Series(dtype=np.int64)})
    edges = df[[a_col, b_col]].astype(np.int64)
    # Undirected: emit both directions once; labels start as self.
    both = pd.concat(
        [
            edges.rename(columns={a_col: "u", b_col: "v"}),
            edges.rename(columns={a_col: "v", b_col: "u"})[["u", "v"]],
        ],
        ignore_index=True,
    ).drop_duplicates()
    nodes = pd.unique(pd.concat([both["u"], both["v"]], ignore_index=True))
    labels = pd.Series(nodes, index=nodes)  # node -> label
    for _ in range(max_rounds):
        # candidate label per node = min(own, neighbors' labels) — one grouped min
        neigh = pd.DataFrame(
            {"node": both["u"].to_numpy(), "lab": labels.loc[both["v"]].to_numpy()}
        )
        own = pd.DataFrame({"node": nodes, "lab": labels.loc[nodes].to_numpy()})
        cand = (
            pd.concat([neigh, own], ignore_index=True)
            .groupby("node")["lab"]
            .min()
        )
        if (cand.loc[nodes].to_numpy() == labels.loc[nodes].to_numpy()).all():
            break
        labels = cand
    out = labels.rename("component").rename_axis("node").reset_index()
    return out.sort_values("node").reset_index(drop=True)


def connected_components_distributed(
    pairs: "ray.data.Dataset",
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 10,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Min-label propagation entirely IN-CLUSTER — labels never visit the driver.

    Each round is two BOUNDED bucket exchanges over datasets the size of the pair
    graph (≪ the corpus): (1) *push* — edges bucketed by ``hash(head) % B`` meet
    the labels bucketed the same way, and one vectorized pandas ``merge`` per
    bucket sends each node's label to its neighbors; (2) *fold* — candidates and
    own labels bucket by ``hash(node) % B`` and one vectorized ``groupby.min``
    per bucket takes the new label. (A bucketed merge instead of `Dataset.join`:
    Ray's join/aggregate emit schema-less EMPTY partition blocks that
    ``map_batches`` skips, and a schema-less block on the probe side sinks the
    next round's Acero key resolution.)

    The only driver-side values are two scalars per round: the label-sum
    checksum (labels are monotone non-increasing, so an unchanged sum ⟺ fixed
    point; int64 wrap makes it a checksum with an astronomically unlikely false
    stop). ``max_rounds`` bounds the loop at O(cluster diameter); near-dup
    clusters are quasi-cliques, so a handful of rounds suffices."""
    import pyarrow as pa

    B = np.uint64(num_buckets)

    def mk_edges(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays(
            [t[a_col].combine_chunks().cast(pa.int64()),
             t[b_col].combine_chunks().cast(pa.int64())]
        )
        v = pa.concat_arrays(
            [t[b_col].combine_chunks().cast(pa.int64()),
             t[a_col].combine_chunks().cast(pa.int64())]
        )
        bv = (v.to_numpy(zero_copy_only=False).astype(np.uint64) % B).astype(np.int32)
        # label column null on edge rows; the per-bucket fn splits on it
        return pa.table(
            {"u": u, "v": v, "label": pa.nulls(len(u), pa.int64()),
             "_b": pa.array(bv, pa.int32())}
        )

    edges = pairs.map_batches(mk_edges, batch_format="pyarrow").materialize()

    def label_rows(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks().cast(pa.int64())
        bv = (node.to_numpy(zero_copy_only=False).astype(np.uint64) % B).astype(np.int32)
        return pa.table(
            {"u": pa.nulls(len(node), pa.int64()), "v": node,
             "label": t["label"].combine_chunks().cast(pa.int64()),
             "_b": pa.array(bv, pa.int32())}
        )

    def push_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One head-bucket: neighbors inherit the bucket's node labels."""
        is_label = g["label"].notna().to_numpy()
        lab = g.loc[is_label, ["v", "label"]].rename(columns={"v": "node"})
        edge = g.loc[~is_label, ["u", "v"]]
        cand = edge.merge(lab, left_on="v", right_on="node")[["u", "label"]]
        out = pd.concat(
            [cand.rename(columns={"u": "node"}), lab], ignore_index=True
        )
        return out.astype({"node": np.int64, "label": np.int64})

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["label"].min()

    def bucket_by_node(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["node"].to_numpy().astype(np.uint64) % B).astype(np.int32)
        return df.assign(_b=b)

    # init: every node's label = min(itself, neighbors) — one fold over edges
    init = edges.map_batches(
        lambda t: pd.DataFrame(
            {
                "node": np.concatenate(
                    [t["u"].to_numpy(zero_copy_only=False)] * 2
                ).astype(np.int64),
                "label": np.concatenate(
                    [t["v"].to_numpy(zero_copy_only=False),
                     t["u"].to_numpy(zero_copy_only=False)]
                ).astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )
    labels = (
        init.map_batches(bucket_by_node, batch_format="pandas")
        .groupby("_b")
        .map_groups(
            lambda g: fold_bucket(g.drop(columns=["_b"])), batch_format="pandas"
        )
        .materialize()
    )
    prev_sum = labels.sum("label")
    for _ in range(max_rounds - 1):
        stream = edges.union(
            labels.map_batches(label_rows, batch_format="pyarrow")
        )
        cands = stream.groupby("_b").map_groups(
            lambda g: push_bucket(g.drop(columns=["_b"])), batch_format="pandas"
        )
        labels = (
            cands.map_batches(bucket_by_node, batch_format="pandas")
            .groupby("_b")
            .map_groups(
                lambda g: fold_bucket(g.drop(columns=["_b"])), batch_format="pandas"
            )
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def sessionize(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = SESSION_GAP_US,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Gap-based session windows per key: a new session starts when the time since
    the previous event exceeds ``gap_us``. Output one row per session:
    (key, session_idx, n_events, start_ts, end_ts)."""
    import pyarrow as pa

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _bucket=(
                pd.util.hash_array(df[key_col].to_numpy()) % num_buckets
            ).astype(np.int32)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, "event_id"] if "event_id" in g else [key_col, ts_col],
                          kind="mergesort")
        ts = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        key = g[key_col].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess = new_key | gap
        sess_seq = np.cumsum(new_sess)
        out = pd.DataFrame({key_col: key, "_sess": sess_seq, "_ts": ts})
        agg = out.groupby([key_col, "_sess"], as_index=False).agg(
            n_events=("_ts", "size"), start_us=("_ts", "min"), end_us=("_ts", "max")
        )
        agg = agg.sort_values([key_col, "start_us"], kind="mergesort")
        agg["session_idx"] = agg.groupby(key_col).cumcount().astype(np.int64)
        return agg[[key_col, "session_idx", "n_events", "start_us", "end_us"]]

    b = events.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_bucket").map_groups(
        lambda g: per_bucket(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


def rolling_sum(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 3,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-key rolling aggregate over the last ``window_rows`` events in
    (ts, id) order — the ordered stateful scan behind per-user running
    metrics. Same shape as `sessionize`: ONE bounded key-bucket exchange, then
    a vectorized prefix-sum-difference per bucket (no per-key Python).

    Exactness contract: 2-decimal values are summed as integer cents
    (``round(value*100)`` is exactly representable), so the rolling sums are
    bit-identical to the SQL window replay — a float cumsum difference would
    drift in the last ulp."""
    import pyarrow as pa  # noqa: F401  (batch_format pandas; Arrow upstream)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _bucket=(
                pd.util.hash_array(df[key_col].to_numpy()) % num_buckets
            ).astype(np.int32)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        n = len(g)
        cents = np.round(g[val_col].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(cents)])
        key = g[key_col].to_numpy()
        idx = np.arange(n, dtype=np.int64)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        starts = np.maximum.accumulate(np.where(new_key, idx, 0))
        lo = np.maximum(idx - (window_rows - 1), starts)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: key,
                "roll_sum": (cs[idx + 1] - cs[lo]) / 100.0,
                "n_window": (idx + 1 - lo).astype(np.int64),
            }
        )

    b = events.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_bucket").map_groups(
        lambda g: per_bucket(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(
    events: "ray.data.Dataset",
    steps: tuple[str, ...] = FUNNEL_STEPS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Ordered funnel analysis: for each key, the earliest completion chain
    through ``steps`` — t1 = min ts of step 1, and t_{i+1} = min ts of step i+1
    STRICTLY after t_i (the standard strict-ordering funnel contract; two steps
    at the same timestamp do not chain). One row per key that reached step 1:
    (key, steps_completed, ts_first_us, ts_last_us) with ts_last the timestamp
    of the deepest step reached.

    Scale shape — same as `sessionize`: ONE bounded key-bucket exchange brings
    each key's events together, then the chain is computed with per-step
    vectorized filter + groupby-min scans inside the bucket (the Python loop is
    over len(steps), not rows). Keys never leave their bucket, so the result is
    bucket-count independent.
    """

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _bucket=(
                pd.util.hash_array(df[key_col].to_numpy()) % num_buckets
            ).astype(np.int32)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[type_col].isin(set(steps))]
        empty = pd.DataFrame(
            {
                key_col: pd.Series([], dtype=np.int64),
                "steps_completed": pd.Series([], dtype=np.int64),
                "ts_first_us": pd.Series([], dtype=np.int64),
                "ts_last_us": pd.Series([], dtype=np.int64),
            }
        )
        if g.empty:
            return empty
        us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        flat = pd.DataFrame(
            {key_col: g[key_col].to_numpy(), "_t": us, "_e": g[type_col].to_numpy()}
        )
        mins: list[pd.Series] = []
        cur: pd.Series | None = None
        for s in steps:
            ev = flat[flat["_e"] == s]
            if cur is not None:
                # NaN (key missing from the previous step) compares False
                ev = ev[ev["_t"].to_numpy() > ev[key_col].map(cur).to_numpy()]
            cur = ev.groupby(key_col)["_t"].min()
            mins.append(cur)
        if mins[0].empty:
            return empty
        res = mins[0].rename("ts_first_us").to_frame()
        res["steps_completed"] = np.int64(1)
        res["ts_last_us"] = res["ts_first_us"]
        for m in mins[1:]:
            # each step's key set is a subset of the previous step's, so
            # membership sums to the chain depth
            mm = res.index.to_series().map(m)
            has = mm.notna().to_numpy()
            res.loc[has, "steps_completed"] += 1
            # epoch-us values are < 2**53, exact in the float64 roundtrip
            res.loc[has, "ts_last_us"] = mm[has].astype(np.int64)
        out = res.reset_index()
        out["steps_completed"] = out["steps_completed"].astype(np.int64)
        return out[[key_col, "steps_completed", "ts_first_us", "ts_last_us"]]

    b = events.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_bucket").map_groups(
        lambda g: per_bucket(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


def reassemble_conversations(
    ds: "ray.data.Dataset",
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-conversation document assembly: every conversation's turns joined in
    turn order into ONE training document (the transcript → SFT-document step).
    Output: (key, n_turns, full_text).

    Scale shape — the sessionize pattern: ONE bounded exchange on
    ``hash(key) % num_buckets`` co-locates each conversation's turns; inside a
    bucket the join is fully vectorized (one mergesort, boundary mask →
    ListArray offsets → ONE Arrow ``binary_join``), never a per-conversation
    Python join. Conversations never straddle buckets, so the result is
    bucket-count independent.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _bucket=(
                pd.util.hash_array(df[key_col].to_numpy()) % num_buckets
            ).astype(np.int32)
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=object),
                    "n_turns": pd.Series([], dtype=np.int64),
                    "full_text": pd.Series([], dtype=object),
                }
            )
        g = g.sort_values([key_col, order_col], kind="mergesort")
        key = g[key_col].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(g)))
        texts = pa.array(g[text_col].fillna("").to_numpy(), pa.string())
        offs = np.append(starts, len(g)).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), texts), " "
        )
        return pd.DataFrame(
            {
                key_col: key[starts],
                "n_turns": counts.astype(np.int64),
                "full_text": joined.to_pandas().to_numpy(),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
