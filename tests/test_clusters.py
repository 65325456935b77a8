"""Connected-components + sessionization tests (union-find / window oracles)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from sts_opentelemetry_collector_ray.stages.clusters import (
    connected_components,
    connected_components_distributed,
    sessionize,
)


def union_find_oracle(pairs):
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    return {n: find(n) for n in parent}


PAIRS = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5), (5, 1)]


def test_connected_components_matches_union_find():
    ds = ray.data.from_pandas(pd.DataFrame(PAIRS, columns=["a", "b"]))
    got = connected_components(ds).set_index("node")["component"].to_dict()
    exp = union_find_oracle(PAIRS)
    assert got == exp
    assert got[5] == 1 and got[11] == 10 and got[22] == 20


def test_connected_components_distributed_matches_driver():
    ds = ray.data.from_pandas(pd.DataFrame(PAIRS, columns=["a", "b"]))
    got = (
        connected_components_distributed(ds)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    exp = union_find_oracle(PAIRS)
    assert got == exp


def test_connected_components_empty():
    ds = ray.data.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                            "b": pd.Series(dtype="int64")}))
    out = connected_components(ds)
    assert len(out) == 0


def test_sessionize_gap_semantics():
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    mins = lambda m: t0 + np.timedelta64(m * 60, "s")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": [mins(0), mins(10), mins(50), mins(55), mins(0), mins(200)],
            "event_id": range(6),
        }
    )
    out = (
        sessionize(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    # user 1: events at 0,10 (session 0), then 50,55 (gap 40min -> session 1)
    u1 = out[out["user_id"] == 1]
    assert u1["n_events"].tolist() == [2, 2]
    assert u1["session_idx"].tolist() == [0, 1]
    # user 2: two sessions of one event each (200min gap)
    u2 = out[out["user_id"] == 2]
    assert u2["n_events"].tolist() == [1, 1]


def test_quantile_sketch_accuracy():
    from sts_opentelemetry_collector_ray.stages.quantiles import quantile_sketch

    rng = np.random.default_rng(3)
    vals = rng.lognormal(mean=10, sigma=2, size=50_000)  # latency-like, heavy tail
    df = pd.DataFrame({"v": vals, "grp": (np.arange(len(vals)) % 2).astype(np.int64)})
    ds = ray.data.from_pandas(df)
    out = quantile_sketch(ds, "v", key_cols=["grp"], qs=[0.5, 0.9, 0.99])
    assert len(out) == 6
    for grp in (0, 1):
        sub = df[df["grp"] == grp]["v"]
        for q in (0.5, 0.9, 0.99):
            est = out[(out["grp"] == grp) & (out["q"] == q)]["estimate"].iloc[0]
            true = np.quantile(sub, q)
            assert abs(np.log(est) - np.log(true)) < 0.12, (grp, q, est, true)
    # global (no key) variant
    g = quantile_sketch(ds, "v", qs=[0.5])
    assert len(g) == 1 and g["estimate"].iloc[0] > 0


def test_asof_join_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.asof import asof_join

    def mk(rows):
        ids, users, tss = zip(*rows)
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array(users, pa.int64()),
                    "ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                }
            )
        )

    # user 1: views at t=10 (id 100), t=20 (ids 101 AND 102 tie), purchase t=20
    #   → '<=' matches at equal ts; tie → larger right id (102)
    # user 2: purchase at t=5 with no prior view → dropped (inner as-of)
    # user 3: purchase t=50, view t=40 → plain match, gap 10
    left = mk([(1, 1, 20), (2, 2, 5), (3, 3, 50)])
    right = mk([(100, 1, 10), (101, 1, 20), (102, 1, 20), (103, 3, 40), (104, 2, 6)])
    out = (
        asof_join(left, right, "user_id", "ts", "event_id", "event_id", num_buckets=4)
        .to_pandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    assert out["left_id"].tolist() == [1, 3]
    assert out["right_id"].tolist() == [102, 103]
    assert out["gap_us"].tolist() == [0, 10]


def test_interval_join_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.asof import interval_join

    points = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "ts": pa.array([10, 25, 31, 5, 100], pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )
    # user 1: [10,20] (s0) and [25,30] (s1); user 2: [90,110] (s0)
    intervals = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "session_idx": pa.array([0, 1, 0], pa.int64()),
                "start_us": pa.array([10, 25, 90], pa.int64()),
                "end_us": pa.array([20, 30, 110], pa.int64()),
            }
        )
    )
    out = (
        interval_join(points, intervals, "user_id", "ts", "event_id", num_buckets=4)
        .to_pandas().sort_values("point_id").reset_index(drop=True)
    )
    # 1 → boundary-start match s0; 2 → s1; 3 (ts=31, past end) drops;
    # 4 (before any interval) drops; 5 → user-2 s0
    assert out["point_id"].tolist() == [1, 2, 5]
    assert out["interval_id"].tolist() == [0, 1, 0]
    assert out["offset_us"].tolist() == [0, 0, 10]


def test_asof_and_interval_join_empty_sides(ray_session):
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.asof import asof_join, interval_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "user_id": pa.array([1], pa.int64()),
                "ts": pa.array([10], pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )
    empty = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )
    assert asof_join(left, empty, "user_id", "ts", "event_id", "event_id").count() == 0
    empty_iv = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
            }
        )
    )
    assert interval_join(left, empty_iv, "user_id", "ts", "event_id").count() == 0
