"""Service-graph connector analogue — span-pair join → RED metrics.

The reference pairs client spans keyed (traceId, spanId) with server spans keyed
(traceId, parentSpanId) in a TTL'd in-memory store, then aggregates request counts,
failed counts and latency histograms per series key (reference:
connector/stsservicegraphconnector/connector.go:253-343 pairing, 387-479 aggregation,
41-44 default latency bounds; store/store.go:45-188 edge store).

Transcript translation: a *caller* turn carrying a tool-call signature pairs with the
immediately following *callee* turn (``turn_idx + 1``) when that turn is a tool turn
for the same tool — the conversational analogue of client/server span matching. Batch
semantics replace the waiting-room store with an exact self-join: hash-bucket by
``conv_id``, pair inside each bucket with a vectorized pandas merge. The reference's
probabilistic eviction compensation (store.go:145-181) is intentionally dropped — a
batch join is exact, no memory-pressure eviction exists (SURVEY.md §2.4 J2).

Latency histograms use the reference's 16 explicit bucket bounds (0.002s … 15s) with
``np.searchsorted`` — the vectorized equivalent of Go's ``sort.SearchFloat64s``
(connector.go:456-479).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# connector.go:41-44 — 16 explicit bounds, seconds.
DEFAULT_LATENCY_BOUNDS = [
    0.002, 0.004, 0.006, 0.008, 0.01, 0.05, 0.1, 0.2, 0.4, 0.8,
    1.0, 1.4, 2.0, 5.0, 10.0, 15.0,
]


def _extract_halves(t: pa.Table) -> pa.Table:
    """Keep only potential edge halves (caller: has tool_sig; callee: tool turn) —
    prunes the join input before the shuffle. Latency uses the COALESCED
    timestamp (`ts_eff`, M15: collection ts with processing-time fallback,
    signal_traverser.go:111-131) so null input timestamps never poison edges."""
    import pyarrow.compute as pc

    caller = pc.is_valid(t["tool_sig"])
    callee = pc.equal(t["role"], "tool")
    keep = pc.or_(caller, callee)
    kept = t.filter(keep)
    ts = kept["ts_eff"] if "ts_eff" in kept.column_names else kept["ts"]
    out = kept.select(["conv_id", "turn_idx", "role", "tool", "severity", "tool_name"])
    return out.append_column("ts", ts)


def _pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
    callers = g[g["tool_name"].notna()][
        ["conv_id", "turn_idx", "role", "tool_name", "ts"]
    ].rename(columns={"role": "client_role", "ts": "client_ts"})
    callees = g[g["role"] == "tool"][
        ["conv_id", "turn_idx", "tool", "severity", "ts"]
    ].rename(columns={"ts": "server_ts"})
    callees = callees.assign(caller_turn=callees["turn_idx"] - 1)
    e = callers.merge(
        callees,
        left_on=["conv_id", "turn_idx", "tool_name"],
        right_on=["conv_id", "caller_turn", "tool"],
        suffixes=("_c", "_s"),
    )
    if e.empty:
        return pd.DataFrame(
            {
                "conv_id": pd.Series(dtype=object),
                "client_turn": pd.Series(dtype=np.int32),
                "server_turn": pd.Series(dtype=np.int32),
                "client_role": pd.Series(dtype=object),
                "tool": pd.Series(dtype=object),
                "failed": pd.Series(dtype=np.int64),
                "latency_us": pd.Series(dtype=np.int64),
            }
        )
    lat = (
        e["server_ts"].to_numpy("datetime64[us]").astype(np.int64)
        - e["client_ts"].to_numpy("datetime64[us]").astype(np.int64)
    )
    return pd.DataFrame(
        {
            "conv_id": e["conv_id"],
            "client_turn": e["turn_idx_c"].astype(np.int32),
            "server_turn": e["turn_idx_s"].astype(np.int32),
            "client_role": e["client_role"],
            "tool": e["tool"],
            "failed": (e["severity"] == "ERROR").astype(np.int64),
            "latency_us": lat,
        }
    )


def edge_table(parsed: "ray.data.Dataset", num_buckets: int = 32) -> "ray.data.Dataset":
    """Paired edges: one row per completed (caller turn → tool turn) edge."""
    halves = parsed.map_batches(_extract_halves, batch_format="pyarrow")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            _bucket=(
                pd.util.hash_array(df["conv_id"].to_numpy(dtype=object)) % num_buckets
            ).astype(np.int32)
        )
        return df

    b = halves.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_bucket").map_groups(
        lambda g: _pair_bucket(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


def red_metrics(
    edges: "ray.data.Dataset", dimensions: list[str] | None = None
) -> "ray.data.Dataset":
    """Request/Error counts + latency sum per series key (A1 + A2 sum/count).

    ``dimensions`` appends extra series-key columns on top of the provided
    (tool, client_role) — the analogue of the connector's ``Dimensions`` config
    (stsservicegraphconnector/config.go:20-27): any edge column can widen the
    series key, pre-combined per batch exactly like the base keys."""
    from ray.data.aggregate import Sum

    keys = ["tool", "client_role"] + list(dimensions or [])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native partial aggregate — no pandas round-trip inside the stage
        g = (
            t.select(keys + ["failed", "latency_us"])
            .group_by(keys)
            .aggregate(
                [("failed", "count"), ("failed", "sum"), ("latency_us", "sum")]
            )
        )
        cols = {k: g[k] for k in keys}
        cols["n"] = g["failed_count"].cast(pa.int64())
        cols["failed"] = g["failed_sum"].cast(pa.int64())
        cols["latency_us_sum"] = g["latency_us_sum"].cast(pa.int64())
        return pa.table(cols)

    partials = edges.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(keys).aggregate(
        Sum("n", alias_name="n"),
        Sum("failed", alias_name="failed"),
        Sum("latency_us_sum", alias_name="latency_us_sum"),
    )


def edge_table_native_join(
    parsed: "ray.data.Dataset", num_partitions: int = 32
) -> "ray.data.Dataset":
    """The same span-pair join expressed with Ray's built-in hash-partitioned
    ``Dataset.join`` (available since 2.46) instead of the explicit bucket
    exchange — the "both sides large" pattern when the engine primitive fits.
    `edge_table` remains the portable/default implementation (works on any Ray
    with groupby, lets the pair logic live next to the bucket salting); this
    variant documents and exercises the native path. Output schema identical."""
    import pyarrow.compute as pc

    halves = parsed.map_batches(_extract_halves, batch_format="pyarrow")

    def callers_of(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t["tool_name"])
        c = t.filter(m)
        return pa.table(
            {
                "conv_id": c["conv_id"],
                "caller_turn": c["turn_idx"],
                "client_role": c["role"],
                "tool_name": c["tool_name"],
                "client_ts": c["ts"],
            }
        )

    def callees_of(t: pa.Table) -> pa.Table:
        m = pc.equal(t["role"], "tool")
        s = t.filter(m)
        return pa.table(
            {
                "conv_id": s["conv_id"],
                "caller_turn": pc.subtract(s["turn_idx"], pa.scalar(1, pa.int32())),
                "server_turn": s["turn_idx"],
                "tool_name": s["tool"],
                "severity": s["severity"],
                "server_ts": s["ts"],
            }
        )

    callers = halves.map_batches(callers_of, batch_format="pyarrow")
    callees = halves.map_batches(callees_of, batch_format="pyarrow")
    joined = callers.join(
        callees,
        join_type="inner",
        num_partitions=num_partitions,
        on=("conv_id", "caller_turn", "tool_name"),
    )

    def finish(t: pa.Table) -> pa.Table:
        lat = pc.subtract(
            t["server_ts"].cast(pa.int64()), t["client_ts"].cast(pa.int64())
        )
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "client_turn": t["caller_turn"],
                "server_turn": t["server_turn"],
                "client_role": t["client_role"],
                "tool": t["tool_name"],
                "failed": pc.cast(pc.equal(t["severity"], "ERROR"), pa.int64()),
                "latency_us": lat,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def servicegraph_relations(red: "ray.data.Dataset") -> "ray.data.Dataset":
    """RED metrics → topology relation rows — the ststopologyexporter's
    ConsumeMetrics path (reference: exporter/ststopologyexporter/exporter.go:81-133:
    picks the service-graph request_total series and emits one relation per
    client/server pair, keyed by canonical URNs)."""
    import pyarrow.compute as pc

    def to_relations(t: pa.Table) -> pa.Table:
        src = pc.binary_join_element_wise("urn:role/", t["client_role"], "")
        tgt = pc.binary_join_element_wise("urn:tool/", t["tool"], "")
        ext = pc.binary_join_element_wise(src, tgt, "-")
        return pa.table(
            {
                "external_id": ext,
                "source_id": src,
                "target_id": tgt,
                "type_name": pa.array(["calls"] * t.num_rows, pa.string()),
                "n": t["n"],
                "failed": t["failed"],
            }
        )

    return red.map_batches(to_relations, batch_format="pyarrow")


def latency_histogram(
    edges: "ray.data.Dataset", bounds: list[float] | None = None
) -> "ray.data.Dataset":
    """(tool, bucket_idx, n): explicit-bounds histogram, bucket index =
    searchsorted(bounds, seconds, 'left') — Go SearchFloat64s semantics."""
    from ray.data.aggregate import Sum

    bounds_arr = np.array(bounds or DEFAULT_LATENCY_BOUNDS, dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        secs = t["latency_us"].to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
        idx = np.searchsorted(bounds_arr, secs, side="left").astype(np.int32)
        tt = pa.table({"tool": t["tool"], "bucket_idx": pa.array(idx)})
        g = tt.group_by(["tool", "bucket_idx"]).aggregate([([], "count_all")])
        return g.rename_columns(["tool", "bucket_idx", "pn"])

    partials = edges.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["tool", "bucket_idx"]).aggregate(Sum("pn", alias_name="n"))


def resolve_database_name(
    db_system: "pa.Array | pa.ChunkedArray",
    peer_service: "pa.Array | pa.ChunkedArray",
    db_name: "pa.Array | pa.ChunkedArray",
    redis_index: "pa.Array | pa.ChunkedArray",
) -> "pa.Array":
    """Database-edge name resolution (stsservicegraphconnector/connector.go:721-744
    FindDatabase): null when db.system is absent; otherwise the first of
    peer.service, db.name, then db.system itself — with the redis special case
    appending the database index ('redis <idx>'). Fully vectorized (one
    np.select over the four attr columns)."""
    import numpy as np
    import pyarrow.compute as pc

    sys_ = db_system.to_numpy(zero_copy_only=False)
    peer = peer_service.to_numpy(zero_copy_only=False)
    name = db_name.to_numpy(zero_copy_only=False)
    ridx = redis_index.to_numpy(zero_copy_only=False)

    has = np.array([v is not None for v in sys_])
    has_peer = np.array([v is not None for v in peer])
    has_name = np.array([v is not None for v in name])
    is_redis = np.array([v == "redis" for v in sys_]) & np.array(
        [v is not None for v in ridx]
    )
    redis_name = np.array(
        [f"redis {r}" if r is not None else None for r in ridx], dtype=object
    )
    out = np.select(
        [~has, has_peer, has_name, is_redis],
        [None, peer, name, redis_name],
        default=sys_,
    )
    return pa.array(out, pa.string())
