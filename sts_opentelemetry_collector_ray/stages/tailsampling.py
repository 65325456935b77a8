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
- ``always_sample``
- ``and`` — all sub-policies must vote Sampled (composite policy)

``sampled_by`` records the FIRST policy (config order) that voted Sampled —
per-trace, like the processor's per-policy decision metrics.

Scale shape: spans move through ONE bounded bucket exchange
(fnv(conv) % num_buckets — the finalize pattern of stages/dedup.py); per-trace
stats and the policy OR are vectorized pandas groupby aggregations inside each
bucket. Rate-limiting and span-count policies are deliberately out of scope:
they depend on arrival order/wall-clock, which a batch replay cannot honor.
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
    if isinstance(p, AlwaysSamplePolicy):
        return np.ones(len(convs), dtype=bool)
    if isinstance(p, AndPolicy):
        v = np.ones(len(convs), dtype=bool)
        for s in p.sub:
            v &= _policy_votes(s, g, convs, df, conv_col)
        return v
    raise ValueError(f"unknown policy {p!r}")


def tail_sample(
    ds: "ray.data.Dataset",
    policies: list[Policy],
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Spans → sampled spans + per-trace ``sampled_by`` column.

    One bounded bucket exchange (trace-aligned); every trace lands whole in
    exactly one bucket, so the per-bucket decision sees all its spans — the
    batch equivalent of the processor's single decision point per trace.
    """

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        conv = pc.cast(t[conv_col], pa.string()).combine_chunks()
        b = (fnv1a32_array(conv.to_numpy(zero_copy_only=False)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return t.append_column("_bucket", pa.array(b, pa.int32()))

    names = [p.name for p in policies]
    if len(set(names)) != len(names):
        raise ValueError("policy names must be unique")

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"])
        if not len(df):
            return df.assign(sampled_by=pd.Series([], dtype=str))
        df["_ts_us"] = df[ts_col].astype("datetime64[us]").astype("int64")
        g = df.groupby(df[conv_col])
        convs = g.size().index
        sampled_by = np.full(len(convs), None, dtype=object)
        undecided = np.ones(len(convs), dtype=bool)
        for p in policies:  # first Sampled vote wins the attribution
            votes = _policy_votes(p, g, convs, df, conv_col)
            take = undecided & votes
            sampled_by[take] = p.name
            undecided &= ~votes
        dec = pd.Series(sampled_by, index=convs)
        df["sampled_by"] = df[conv_col].map(dec)
        return df[df["sampled_by"].notna()].drop(columns=["_ts_us"])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(decide, batch_format="pandas")
    )
