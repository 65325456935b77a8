"""Tail-based sampling policies (stages/tailsampling.py; the reference ships
the upstream tailsamplingprocessor — agent-otel-builder.yaml:44)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32
from sts_opentelemetry_collector_ray.stages.tailsampling import (
    AlwaysSamplePolicy,
    AndPolicy,
    LatencyPolicy,
    NumericAttributePolicy,
    ProbabilisticPolicy,
    StatusCodePolicy,
    tail_sample,
)


def _spans() -> pa.Table:
    # c1: 2s duration, no error; c2: 10s, error on span 1; c3: single span
    return pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2", "c2", "c3"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1, 0], pa.int64()),
            "severity": pa.array(["INFO", "INFO", "INFO", "ERROR", "WARN"], pa.string()),
            "tool": pa.array(["", "bash", "", "search", ""], pa.string()),
            "ts": pa.array(
                [0, 2_000_000, 0, 10_000_000, 5_000_000], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


def _run(policies):
    import ray.data

    out = tail_sample(ray.data.from_arrow(_spans()), policies, num_buckets=4)
    pdf = out.to_pandas()
    if not len(pdf):  # fully-dropped output has no schema to sort on
        return pdf
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_latency_policy_whole_trace(ray_session):
    df = _run([LatencyPolicy("slow", threshold_ms=5000)])
    # only c2 (10s) clears 5s; BOTH its spans survive, non-matching spans drop
    assert sorted(df["conv_id"].unique()) == ["c2"]
    assert len(df) == 2
    assert set(df["sampled_by"]) == {"slow"}


def test_status_code_keeps_whole_trace(ray_session):
    df = _run([StatusCodePolicy("err", codes=("ERROR",))])
    assert sorted(df["conv_id"].unique()) == ["c2"]
    assert df["turn_idx"].tolist() == [0, 1]  # the INFO span rides along


def test_first_match_attribution_order(ray_session):
    # c2 matches both; latency listed first wins the attribution
    df = _run(
        [LatencyPolicy("slow", threshold_ms=5000), StatusCodePolicy("err", codes=("ERROR",))]
    )
    assert set(df["sampled_by"]) == {"slow"}
    df2 = _run(
        [StatusCodePolicy("err", codes=("ERROR",)), LatencyPolicy("slow", threshold_ms=5000)]
    )
    assert set(df2["sampled_by"]) == {"err"}


def test_numeric_and_probabilistic(ray_session):
    df = _run([NumericAttributePolicy("long", col="turn_idx", min_value=1)])
    assert sorted(df["conv_id"].unique()) == ["c1", "c2"]
    pct = 50
    expect = sorted(c for c in ["c1", "c2", "c3"] if fnv1a32(c) % 100 < pct)
    df2 = _run([ProbabilisticPolicy("prob", pct=pct)])
    assert sorted(df2["conv_id"].unique()) == expect


def test_and_policy_conjunction(ray_session):
    df = _run(
        [
            AndPolicy(
                "err_slow",
                sub=(
                    StatusCodePolicy("e", codes=("ERROR",)),
                    LatencyPolicy("l", threshold_ms=20_000),  # nothing this slow
                ),
            )
        ]
    )
    assert len(df) == 0
    df2 = _run(
        [
            AndPolicy(
                "err_slow",
                sub=(
                    StatusCodePolicy("e", codes=("ERROR",)),
                    LatencyPolicy("l", threshold_ms=5000),
                ),
            )
        ]
    )
    assert sorted(df2["conv_id"].unique()) == ["c2"]


def test_always_sample_and_unique_names(ray_session):
    df = _run([AlwaysSamplePolicy("all")])
    assert len(df) == 5
    with pytest.raises(ValueError, match="unique"):
        _run([AlwaysSamplePolicy("x"), AlwaysSamplePolicy("x")])
