"""Tail-based sampling: whole-trace keep/drop decisions from span evidence.

The reference ships the upstream tail-sampling processor in its agent build
(reference: agent-otel-builder.yaml:44 — tailsamplingprocessor v0.153.0)
without custom code; this stage re-expresses the public processor's policy
model for batch: a trace is sampled iff ANY configured policy votes Sampled,
and the decision applies to EVERY span of the trace (the processor buffers a
trace for decision_wait then evaluates policies over all its spans; in batch
the full trace is simply present, so decision_wait disappears).

Policies implemented (the processor's most-used set):

- ``latency``      — trace duration (max ts − min ts) ≥ threshold_ms
- ``status_code``  — any span severity in the configured set (ERROR, …)
- ``string_attribute`` — any span whose attribute column takes a listed value
- ``numeric_attribute`` — any span whose numeric attribute falls in [min, max]
- ``probabilistic`` — FNV-1a32(trace_id) % 100 < pct (deterministic, no RNG —
  the repo's established O4 sampling translation)
- ``span_count``   — min_spans ≤ trace span count ≤ max_spans (batch-EXACT:
  the processor counts a trace's buffered spans; in batch the full trace is
  present, so the count is the true one)
- ``always_sample``
- ``and`` — all sub-policies must vote Sampled (composite policy)

``sampled_by`` records the FIRST policy (config order) that voted Sampled —
per-trace, like the processor's per-policy decision metrics.

Scale shape: spans move through ONE bounded bucket exchange
(fnv(conv) % num_buckets — the finalize pattern of stages/dedup.py); per-trace
stats and the policy OR are vectorized pandas groupby aggregations inside each
bucket.

The processor's remaining policy, ``rate_limiting`` (spans/second at ARRIVAL),
is arrival-order dependent and cannot join the per-trace vote OR above; its
batch-honorable translation is the standalone ``rate_limit_sample`` operator
below, which admits traces by EVENT-TIME second deterministically. Only the
wall-clock-arrival semantics itself remains out of scope.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a32_array


@dataclass(frozen=True)
class Policy:
    name: str


@dataclass(frozen=True)
class LatencyPolicy(Policy):
    threshold_ms: int = 1000


@dataclass(frozen=True)
class StatusCodePolicy(Policy):
    codes: tuple[str, ...] = ("ERROR",)
    col: str = "severity"


@dataclass(frozen=True)
class StringAttributePolicy(Policy):
    col: str = "tool"
    values: tuple[str, ...] = ()


@dataclass(frozen=True)
class NumericAttributePolicy(Policy):
    col: str = "turn_idx"
    min_value: float = float("-inf")
    max_value: float = float("inf")


@dataclass(frozen=True)
class ProbabilisticPolicy(Policy):
    pct: int = 10


@dataclass(frozen=True)
class SpanCountPolicy(Policy):
    """tailsamplingprocessor's span_count policy: sample iff the trace's span
    count lies in [min_spans, max_spans]. Batch-exact (full trace present)."""

    min_spans: int = 1
    max_spans: int | None = None


@dataclass(frozen=True)
class AlwaysSamplePolicy(Policy):
    pass


@dataclass(frozen=True)
class AndPolicy(Policy):
    sub: tuple[Policy, ...] = field(default_factory=tuple)


def _policy_votes(p: Policy, g: "pd.core.groupby.DataFrameGroupBy",
                  convs: pd.Index, df: pd.DataFrame, conv_col: str) -> np.ndarray:
    """Per-trace boolean vote for one policy, aligned to `convs` order.
    All paths are vectorized groupby reductions — no per-trace Python."""
    if isinstance(p, LatencyPolicy):
        ts = df["_ts_us"]
        dur_ms = (ts.groupby(df[conv_col]).max() - ts.groupby(df[conv_col]).min()) // 1000
        return dur_ms.reindex(convs).to_numpy() >= p.threshold_ms
    if isinstance(p, StatusCodePolicy):
        hit = df[p.col].isin(p.codes)
        return hit.groupby(df[conv_col]).any().reindex(convs).to_numpy()
    if isinstance(p, StringAttributePolicy):
        hit = df[p.col].isin(p.values)
        return hit.groupby(df[conv_col]).any().reindex(convs).to_numpy()
    if isinstance(p, NumericAttributePolicy):
        v = df[p.col].astype(float)
        hit = (v >= p.min_value) & (v <= p.max_value)
        return hit.groupby(df[conv_col]).any().reindex(convs).to_numpy()
    if isinstance(p, ProbabilisticPolicy):
        h = fnv1a32_array(convs.to_numpy()) % np.uint64(100)
        return h < p.pct
    if isinstance(p, SpanCountPolicy):
        n = g.size().reindex(convs).to_numpy()
        ok = n >= p.min_spans
        if p.max_spans is not None:
            ok &= n <= p.max_spans
        return ok
    if isinstance(p, AlwaysSamplePolicy):
        return np.ones(len(convs), dtype=bool)
    if isinstance(p, AndPolicy):
        v = np.ones(len(convs), dtype=bool)
        for s in p.sub:
            v &= _policy_votes(s, g, convs, df, conv_col)
        return v
    raise ValueError(f"unknown policy {p!r}")


def _leaf_specs(policies: "list[Policy]") -> dict:
    """Collect the distinct per-span predicates the policy set needs, keyed by
    (kind, col, params) → stable spec index. Latency/span-count share the
    universal (n, ts_min, ts_max) stats; probabilistic/always need none."""
    specs: dict = {}

    def walk(p: Policy) -> None:
        if isinstance(p, AndPolicy):
            for s in p.sub:
                walk(s)
        elif isinstance(p, StatusCodePolicy):
            specs.setdefault(("in", p.col, tuple(p.codes)), len(specs))
        elif isinstance(p, StringAttributePolicy):
            specs.setdefault(("in", p.col, tuple(p.values)), len(specs))
        elif isinstance(p, NumericAttributePolicy):
            specs.setdefault(("range", p.col, p.min_value, p.max_value), len(specs))

    for p in policies:
        walk(p)
    return specs


def _votes_from_stats(
    p: Policy, agg: pd.DataFrame, convs: np.ndarray, specs: dict
) -> np.ndarray:
    """Per-trace vote from the AGGREGATED stats frame (one row per trace) —
    the algebraic form of _policy_votes; NaN stats (all-null ts) vote False."""
    if isinstance(p, LatencyPolicy):
        mn = agg["ts_min"].to_numpy(np.float64)
        mx = agg["ts_max"].to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            dur_ms = (mx - mn) // 1000
            out = dur_ms >= p.threshold_ms
        return np.where(np.isnan(dur_ms), False, out)
    if isinstance(p, StatusCodePolicy):
        return agg[f"h{specs[('in', p.col, tuple(p.codes))]}"].to_numpy(bool)
    if isinstance(p, StringAttributePolicy):
        return agg[f"h{specs[('in', p.col, tuple(p.values))]}"].to_numpy(bool)
    if isinstance(p, NumericAttributePolicy):
        key = ("range", p.col, p.min_value, p.max_value)
        return agg[f"h{specs[key]}"].to_numpy(bool)
    if isinstance(p, ProbabilisticPolicy):
        return (fnv1a32_array(convs) % np.uint64(100)) < p.pct
    if isinstance(p, SpanCountPolicy):
        n = agg["n"].to_numpy(np.int64)
        ok = n >= p.min_spans
        if p.max_spans is not None:
            ok &= n <= p.max_spans
        return ok
    if isinstance(p, AlwaysSamplePolicy):
        return np.ones(len(convs), dtype=bool)
    if isinstance(p, AndPolicy):
        v = np.ones(len(convs), dtype=bool)
        for s in p.sub:
            v &= _votes_from_stats(s, agg, convs, specs)
        return v
    raise ValueError(f"unknown policy {p!r}")


def _attach_decisions(
    ds: "ray.data.Dataset",
    decisions: "ray.data.Dataset",
    conv_col: str,
    num_buckets: int,
    broadcast_threshold_rows: int,
    label_col: str | None = None,
):
    """Filter the span stream to decided traces, optionally attaching the
    per-trace ``label_col`` — WITHOUT ``Dataset.join`` (schema-less empty
    blocks sink it) and, in the common case, without shuffling spans at all.

    ``decisions`` must be MATERIALIZED (1 slim row per decided trace; it is
    what breaks the lazy dataset branch — CLAUDE.md). When its row count is ≤
    ``broadcast_threshold_rows`` the (conv → label) table is broadcast via
    ``ray.put`` and each span batch resolves map-side with one ``pc.index_in``
    kernel — zero span shuffles. Above the threshold the spans take ONE
    conv-bucketed union semi-join exchange."""
    import pyarrow.compute as pc

    B = np.uint64(num_buckets)
    n_dec = decisions.count()

    if n_dec == 0:

        def none(t: pa.Table) -> pa.Table:
            out = t.slice(0, 0)
            if label_col is not None:
                out = out.append_column(label_col, pa.array([], pa.string()))
            return out

        return ds.map_batches(none, batch_format="pyarrow")

    if n_dec <= broadcast_threshold_rows:
        df = decisions.to_pandas()
        convs = pa.array(df[conv_col].astype(str), pa.string())
        labels = (
            pa.array(df[label_col].astype(str), pa.string())
            if label_col is not None
            else None
        )
        ref = ray.put((convs, labels))

        def attach(t: pa.Table) -> pa.Table:
            convs_b, labels_b = ray.get(ref)
            idx = pc.index_in(pc.cast(t[conv_col], pa.string()), value_set=convs_b)
            keep = pc.is_valid(idx)
            out = t.filter(keep)
            if labels_b is not None:
                out = out.append_column(label_col, labels_b.take(idx.filter(keep)))
            return out

        return ds.map_batches(attach, batch_format="pyarrow")

    # fallback: conv-bucketed union semi-join (one span shuffle)
    def conv_bucket(t: pa.Table) -> pa.Table:
        conv = pc.cast(t[conv_col], pa.string()).combine_chunks()
        b = (fnv1a32_array(conv.to_numpy(zero_copy_only=False)) % B).astype(np.int32)
        return t.append_column("_b", pa.array(b, pa.int32())).replace_schema_metadata(None)

    def mark_spans(t: pa.Table) -> pa.Table:
        out = t.append_column("_dec", pa.array(np.zeros(t.num_rows, dtype=bool)))
        if label_col is not None:
            out = out.append_column("_declabel", pa.nulls(t.num_rows, pa.string()))
        return out.replace_schema_metadata(None)

    spans_b = ds.map_batches(conv_bucket, batch_format="pyarrow").map_batches(
        mark_spans, batch_format="pyarrow"
    )
    span_schema = spans_b.schema().base_schema

    def dec_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = (fnv1a32_array(df[conv_col].to_numpy(dtype=object)) % B).astype(np.int32)
        cols = {conv_col: df[conv_col], "_b": b}
        if label_col is not None:
            cols["_declabel"] = df[label_col]
        return pd.DataFrame(cols)

    dec = decisions.map_batches(dec_bucket, batch_format="pandas")

    def dec_rows(t: pa.Table) -> pa.Table:
        cols = {}
        for f in span_schema:
            if f.name == conv_col:
                cols[f.name] = pc.cast(t[conv_col], f.type)
            elif f.name == "_b":
                cols[f.name] = pc.cast(t["_b"], f.type)
            elif f.name == "_dec":
                cols[f.name] = pa.array(np.ones(t.num_rows, dtype=bool))
            elif f.name == "_declabel":
                cols[f.name] = pc.cast(t["_declabel"], pa.string())
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols).cast(span_schema).replace_schema_metadata(None)

    dec_b = dec.map_batches(dec_rows, batch_format="pyarrow")

    def filter_bucket(t: pa.Table) -> pa.Table:
        # Arrow-only (a pandas frame would NaN-float the typed span columns
        # that the slim decision rows leave null)
        is_dec = t["_dec"]
        dec_t = t.filter(is_dec)
        idx = pc.index_in(
            t[conv_col].combine_chunks(), value_set=dec_t[conv_col].combine_chunks()
        )
        keep = pc.and_(pc.invert(is_dec), pc.is_valid(idx))
        out = t.filter(keep)
        drop = ["_dec"] + (["_declabel"] if label_col is not None else [])
        out = out.drop_columns(drop)
        if label_col is not None:
            labels = dec_t["_declabel"].combine_chunks().take(
                pc.filter(idx, keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep)
            )
            out = out.append_column(label_col, pc.cast(labels, pa.string()))
        return out

    return (
        spans_b.union(dec_b)
        .groupby("_b")
        .map_groups(filter_bucket, batch_format="pyarrow")
        .drop_columns(["_b"])
    )


def tail_sample(
    ds: "ray.data.Dataset",
    policies: list[Policy],
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
    broadcast_threshold_rows: int = 5_000_000,
) -> "ray.data.Dataset":
    """Spans → sampled spans + per-trace ``sampled_by`` column.

    Scale shape — every policy in the set is ALGEBRAIC, so spans are never
    shuffled: per-batch Arrow ``group_by`` computes partial (n, ts_min,
    ts_max, per-predicate any-hit) rows; one bounded conv-hash bucket exchange
    re-reduces the partials exactly (multi-block traces sum/min/max/or
    correctly) and evaluates the policy OR with first-vote attribution; the
    slim (conv, sampled_by) decision set is then broadcast back over the span
    stream (``_attach_decisions`` — map-side ``pc.index_in``, with a bucketed
    union semi-join fallback above the broadcast threshold).

    Null-ts spans count toward span_count (count(*)) but never define
    ts_min/ts_max (SQL min/max semantics); an all-null-ts trace votes False on
    latency.
    """
    import pyarrow.compute as pc

    names = [p.name for p in policies]
    if len(set(names)) != len(names):
        raise ValueError("policy names must be unique")

    specs = _leaf_specs(policies)
    B = np.uint64(num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        conv = pc.cast(t[conv_col], pa.string())
        ts_us = pc.cast(t[ts_col], pa.timestamp("us")).cast(pa.int64())
        cols: dict = {conv_col: conv, "_ts": ts_us}
        aggs: list = [
            ("_ts", "count", pc.CountOptions(mode="all")),
            ("_ts", "min"),
            ("_ts", "max"),
        ]
        names_out = [conv_col, "n", "ts_min", "ts_max"]
        for key, j in specs.items():
            if key[0] == "in":
                hit = pc.is_in(t[key[1]], value_set=pa.array(list(key[2]), pa.string()))
            else:
                v = pc.cast(t[key[1]], pa.float64())
                hit = pc.and_(
                    pc.greater_equal(v, pa.scalar(key[2], pa.float64())),
                    pc.less_equal(v, pa.scalar(key[3], pa.float64())),
                )
            cols[f"_h{j}"] = pc.fill_null(hit, False)
            aggs.append((f"_h{j}", "any"))
            names_out.append(f"h{j}")
        g = pa.table(cols).group_by(conv_col).aggregate(aggs).rename_columns(names_out)
        cb = (
            fnv1a32_array(g[conv_col].combine_chunks().to_numpy(zero_copy_only=False))
            % B
        ).astype(np.int32)
        return g.append_column("_b", pa.array(cb, pa.int32())).replace_schema_metadata(None)

    def reduce_and_decide(g: pd.DataFrame) -> pd.DataFrame:
        named = {
            "n": ("n", "sum"),
            "ts_min": ("ts_min", "min"),
            "ts_max": ("ts_max", "max"),
        }
        for j in specs.values():
            named[f"h{j}"] = (f"h{j}", "max")
        agg = g.groupby(conv_col, as_index=False).agg(**named)
        convs = agg[conv_col].to_numpy(dtype=object)
        sampled_by = np.full(len(convs), None, dtype=object)
        undecided = np.ones(len(convs), dtype=bool)
        for p in policies:  # first Sampled vote wins the attribution
            votes = _votes_from_stats(p, agg, convs, specs)
            take = undecided & votes
            sampled_by[take] = p.name
            undecided &= ~votes
        keep = sampled_by != None  # noqa: E711
        return pd.DataFrame(
            {conv_col: convs[keep], "sampled_by": sampled_by[keep].astype(str)}
        )

    decisions = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(reduce_and_decide, batch_format="pandas")
        .materialize()
    )
    return _attach_decisions(
        ds, decisions, conv_col, num_buckets, broadcast_threshold_rows,
        label_col="sampled_by",
    )


def rate_limit_sample(
    ds: "ray.data.Dataset",
    spans_per_second: int,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
    broadcast_threshold_rows: int = 5_000_000,
) -> "ray.data.Dataset":
    """Event-time rate limiting — the batch-honorable translation of the
    processor's ``rate_limiting`` policy (spans_per_second).

    Translation contract (documented, deliberate): the processor admits traces
    in ARRIVAL order until the current wall-clock second's span budget is
    spent; a batch replay has no arrival order, so admission is by EVENT TIME —
    each trace is attributed to the second its FIRST span starts in (the
    decision-instant analogue) and traces are admitted in (start_ts, conv_id)
    order until that second's budget of ``spans_per_second`` spans is
    exhausted. Whole-trace keep/drop, fully deterministic, SQL-replayable.

    Scale shape — spans themselves are NEVER shuffled:
      1. per-batch Arrow group_by → partial (conv, n, start_us) rows; only
         these partials (1 row per trace-per-block) enter a bounded conv-hash
         bucket exchange where a vectorized re-reduce makes them exact;
      2. a second bounded bucket exchange (by start-second hash) runs the
         per-second admission cumsum — 1 row/trace moves;
      3. the admitted trace-id set is materialized (it is what breaks the lazy
         dataset branch — CLAUDE.md) and, when ≤ ``broadcast_threshold_rows``,
         BROADCAST via ``ray.put`` so the span stream filters map-side with one
         ``pc.is_in`` kernel per batch — zero span shuffles end-to-end
         (measured: 18.5 s → 3.8 s on 3M spans / 32 CPUs). Above the
         threshold it falls back to a conv-bucketed union semi-join (never
         ``Dataset.join`` — schema-less empty blocks sink it), which shuffles
         the spans once.
    """
    import pyarrow.compute as pc

    B = np.uint64(num_buckets)

    def partial_stats(t: pa.Table) -> pa.Table:
        conv = pc.cast(t[conv_col], pa.string())
        ts_us = pc.cast(t[ts_col], pa.timestamp("us")).cast(pa.int64())
        g = (
            pa.table({conv_col: conv, "_ts": ts_us})
            .group_by(conv_col)
            # count mode="all" = SQL count(*); min skips nulls = SQL min —
            # null-ts spans count toward the budget but never define the start
            .aggregate(
                [("_ts", "count", pc.CountOptions(mode="all")), ("_ts", "min")]
            )
            .rename_columns([conv_col, "n", "start_us"])
        )
        cb = (
            fnv1a32_array(g[conv_col].combine_chunks().to_numpy(zero_copy_only=False))
            % B
        ).astype(np.int32)
        return g.append_column("_b", pa.array(cb, pa.int32())).replace_schema_metadata(None)

    def reduce_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(conv_col, as_index=False).agg(
            n=("n", "sum"), start_us=("start_us", "min")
        )
        agg["sec"] = agg["start_us"] // 1_000_000
        # all-null-ts traces: SQL's NULL sec forms ONE window partition (they
        # compete for a shared budget, NULLS LAST in start order); NaN would be
        # dropped by pandas groupby and hash unstably — use a sentinel second
        sent = np.iinfo(np.int64).max
        agg["sec"] = agg["sec"].fillna(sent).astype(np.int64)
        agg["start_us"] = agg["start_us"].fillna(sent).astype(np.int64)
        agg["_sb"] = (agg["sec"].to_numpy().astype(np.uint64) % B).astype(np.int32)
        return agg[[conv_col, "n", "start_us", "sec", "_sb"]]

    stats = (
        ds.map_batches(partial_stats, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(reduce_stats, batch_format="pandas")
    )

    def admit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sec", "start_us", conv_col], kind="mergesort")
        cum = g.groupby("sec")["n"].cumsum()
        return g.loc[cum.to_numpy() <= spans_per_second, [conv_col]]

    admitted = (
        stats.groupby("_sb").map_groups(admit, batch_format="pandas").materialize()
    )
    return _attach_decisions(
        ds, admitted, conv_col, num_buckets, broadcast_threshold_rows, label_col=None
    )
