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


def test_span_count_policy_band(ray_session):
    from sts_opentelemetry_collector_ray.stages.tailsampling import SpanCountPolicy

    # c1/c2 have 2 spans, c3 has 1 → min_spans=2 keeps c1+c2; max_spans=1 keeps c3
    df = _run([SpanCountPolicy("big", min_spans=2)])
    assert sorted(df["conv_id"].unique()) == ["c1", "c2"]
    assert set(df["sampled_by"]) == {"big"}
    df = _run([SpanCountPolicy("single", min_spans=1, max_spans=1)])
    assert sorted(df["conv_id"].unique()) == ["c3"]


def test_rate_limit_sample_event_time(ray_session):
    """Admission per event-time second in (start_ts, conv_id) order: a second
    whose traces outgrow the budget keeps only the earliest-starting ones;
    traces never split."""
    import ray.data

    from sts_opentelemetry_collector_ray.stages.tailsampling import rate_limit_sample

    S = 1_000_000  # 1 s in us
    t = pa.table(
        {
            # second 0: a(3 spans, starts t=0), b(2 spans, starts t=100us)
            # second 1: c(2 spans) — under budget alone
            "conv_id": pa.array(["a", "a", "a", "b", "b", "c", "c"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0, 1, 0, 1], pa.int64()),
            "ts": pa.array(
                [0, 10, 2 * S, 100, 50, S, S + 10], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t)
    out = rate_limit_sample(ds, spans_per_second=3, num_buckets=4).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # budget 3 in second 0: a (3 spans) admitted first by start_ts, b over budget;
    # c admitted in second 1. a's third span lives in second 2 but the whole
    # trace is attributed to its START second — it rides along (trace-atomic).
    assert out["conv_id"].tolist() == ["a", "a", "a", "c", "c"]
    # dtypes survive the slim-decision union (no NaN-float mangling)
    assert out["turn_idx"].dtype == np.int64
    # budget 5 admits a AND b in second 0
    out5 = rate_limit_sample(ds, spans_per_second=5, num_buckets=4).to_pandas()
    assert sorted(out5["conv_id"].unique()) == ["a", "b", "c"]


def test_rate_limit_tie_breaks_on_conv_id(ray_session):
    import ray.data

    from sts_opentelemetry_collector_ray.stages.tailsampling import rate_limit_sample

    # equal start_ts → conv_id lexicographic order decides admission
    t = pa.table(
        {
            "conv_id": pa.array(["x", "y"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int64()),
            "ts": pa.array([7, 7], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = rate_limit_sample(
        ray.data.from_arrow(t), spans_per_second=1, num_buckets=4
    ).to_pandas()
    assert out["conv_id"].tolist() == ["x"]


def test_rate_limit_invariants_random_corpus(ray_session):
    """Deterministic pseudo-random corpus: (1) output is a subset of input,
    (2) traces never split, (3) per-second admitted span budget holds for
    spans attributed to that second's admitted traces, (4) admission equals
    a straightforward single-process replay."""
    import ray.data

    from sts_opentelemetry_collector_ray.stages.tailsampling import rate_limit_sample

    rng = np.random.default_rng(1234)
    convs, tss, idxs = [], [], []
    for c in range(40):
        n = int(rng.integers(1, 9))
        start = int(rng.integers(0, 6)) * 1_000_000 + int(rng.integers(0, 1_000_000))
        for i in range(n):
            convs.append(f"c{c:02d}")
            tss.append(start + i * int(rng.integers(0, 800_000)))
            idxs.append(i)
    t = pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(idxs, pa.int64()),
            "ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    budget = 10
    out = rate_limit_sample(
        ray.data.from_arrow(t), spans_per_second=budget, num_buckets=8
    ).to_pandas()

    df = t.to_pandas()
    per = df.groupby("conv_id").agg(n=("ts", "size"), start=("ts", "min")).reset_index()
    per["start_us"] = per["start"].astype("datetime64[us]").astype("int64")
    per["sec"] = per["start_us"] // 1_000_000
    per = per.sort_values(["sec", "start_us", "conv_id"], kind="mergesort")
    per["cum"] = per.groupby("sec")["n"].cumsum()
    expected = set(per.loc[per["cum"] <= budget, "conv_id"])

    got_traces = set(out["conv_id"])
    assert got_traces == expected  # (4) replay equality
    counts = out.groupby("conv_id").size()
    full = df.groupby("conv_id").size()
    for c in got_traces:
        assert counts[c] == full[c]  # (2) trace-atomic
    merged = out.merge(df, on=["conv_id", "turn_idx", "ts"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()  # (1) subset of input


def test_rate_limit_null_timestamps_sql_semantics(ray_session):
    """SQL-oracle parity under null ts: null-ts spans count toward a trace's
    budget (count(*)), never define its start (min skips nulls), and traces
    whose EVERY span is null-ts form one shared NULL-second partition admitted
    NULLS-LAST in conv_id order — verified against an inline DuckDB replay."""
    import duckdb
    import ray.data

    from sts_opentelemetry_collector_ray.stages.tailsampling import rate_limit_sample

    S = 1_000_000
    t = pa.table(
        {
            # a: 1 real + 1 null-ts span (n=2, starts sec 0)
            # b: all-null ts (NULL partition)   c: all-null ts (NULL partition)
            # d: sec 0, n=2
            "conv_id": pa.array(["a", "a", "b", "c", "d", "d"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 0, 0, 1], pa.int64()),
            "ts": pa.array([10, None, None, None, 20, 30], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    for thr in (5_000_000, 0):  # broadcast path and bucketed-union fallback
        out = rate_limit_sample(
            ray.data.from_arrow(t), spans_per_second=3, num_buckets=4,
            broadcast_threshold_rows=thr,
        ).to_pandas()
        got = sorted(out["conv_id"].unique())
        con = duckdb.connect()
        con.register("spans", t.to_pandas())
        exp = con.execute(
            """
            WITH tr AS (SELECT conv_id, count(*) AS n, min(epoch_us(ts)) AS start_us
                        FROM spans GROUP BY 1),
            sec AS (SELECT conv_id, n, start_us, start_us // 1000000 AS sec FROM tr),
            adm AS (SELECT conv_id, sum(n) OVER (PARTITION BY sec
                    ORDER BY start_us, conv_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sec)
            SELECT conv_id FROM adm WHERE cum <= 3 ORDER BY conv_id"""
        ).df()["conv_id"].tolist()
        assert got == exp, (thr, got, exp)
    # concretely: sec 0 admits a (n=2) then d would exceed? a starts at 10us,
    # d at 20us: cum a=2, d=4 > 3 → d dropped; NULL partition: b then c, cum
    # b=1, c=2 ≤ 3 → both admitted
    assert got == ["a", "b", "c"]


def test_tail_sample_fallback_equals_broadcast(ray_session):
    """The over-threshold union-semi-join path must produce the same sampled
    spans AND the same sampled_by labels as the broadcast path."""
    import ray.data

    from sts_opentelemetry_collector_ray.stages.tailsampling import (
        SpanCountPolicy,
        tail_sample as ts,
    )

    policies = [
        LatencyPolicy("slow", threshold_ms=5000),
        StatusCodePolicy("err", codes=("ERROR",)),
        SpanCountPolicy("single", min_spans=1, max_spans=1),
    ]
    key = ["conv_id", "turn_idx"]
    a = (
        ts(ray.data.from_arrow(_spans()), policies, num_buckets=4)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        ts(ray.data.from_arrow(_spans()), policies, num_buckets=4,
           broadcast_threshold_rows=0)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[key + ["sampled_by"]], b[key + ["sampled_by"]])


def test_tail_sample_aggregate_matches_spanlevel_reference(ray_session):
    """Differential: the algebraic (partial-stats) evaluation equals the
    span-level reference evaluation (_policy_votes) on a pseudo-random corpus
    with every policy kind incl. a nested AND."""
    import ray.data

    from sts_opentelemetry_collector_ray.stages.tailsampling import (
        AndPolicy,
        LatencyPolicy,
        NumericAttributePolicy,
        ProbabilisticPolicy,
        SpanCountPolicy,
        StatusCodePolicy,
        StringAttributePolicy,
        _policy_votes,
        tail_sample as ts,
    )

    rng = np.random.default_rng(99)
    n = 600
    conv = [f"t{int(i):03d}" for i in rng.integers(0, 60, n)]
    t = pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(rng.integers(0, 90, n), pa.int64()),
            "severity": pa.array(
                np.array(["INFO", "WARN", "ERROR"])[rng.integers(0, 3, n)], pa.string()
            ),
            "tool": pa.array(
                np.array(["", "bash", "search"])[rng.integers(0, 3, n)], pa.string()
            ),
            "ts": pa.array(rng.integers(0, 20_000_000, n), pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    policies = [
        LatencyPolicy("slow", threshold_ms=15_000),
        StringAttributePolicy("bashy", col="tool", values=("bash",)),
        NumericAttributePolicy("long", col="turn_idx", min_value=80),
        AndPolicy(
            "err_prob",
            sub=(
                StatusCodePolicy("e", codes=("ERROR",)),
                ProbabilisticPolicy("p", pct=50),
            ),
        ),
        SpanCountPolicy("big", min_spans=12),
    ]
    got = ts(ray.data.from_arrow(t), policies, num_buckets=4).to_pandas()
    got_dec = dict(
        got.drop_duplicates("conv_id")[["conv_id", "sampled_by"]].itertuples(
            index=False, name=None
        )
    )
    # span-level reference (single-process)
    df = t.to_pandas()
    df["_ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    g = df.groupby(df["conv_id"])
    convs = g.size().index
    sampled_by = np.full(len(convs), None, dtype=object)
    undecided = np.ones(len(convs), dtype=bool)
    for p in policies:
        votes = _policy_votes(p, g, convs, df, "conv_id")
        take = undecided & votes
        sampled_by[take] = p.name
        undecided &= ~votes
    exp_dec = {c: s for c, s in zip(convs, sampled_by) if s is not None}
    assert got_dec == exp_dec
