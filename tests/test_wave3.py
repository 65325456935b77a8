"""Wave-3 operator tests: metric-type dispatch (K4), body normalization (M14)."""

import numpy as np
import pyarrow as pa
import pytest

from sts_opentelemetry_collector_ray.stages.body import normalize_body_batch
from sts_opentelemetry_collector_ray.stages.metrics_dispatch import (
    TYPE_MODEL,
    dispatch_batch,
)


def test_metrics_dispatch_models_and_buckets():
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "event_type": ["view", "click", "purchase", "signup", "error"],
            "value": pa.array([5.0, 60.0, 100.0, 0.0, 512.0], pa.float64()),
        }
    )
    out = dispatch_batch(t)
    assert out["model"].to_pylist() == ["gauge", "sum", "histogram", "exp_histogram", "summary"]
    # bounds [10, 50, 100, 500], searchsorted left
    assert out["hist_bucket"].to_pylist() == [0, 2, 2, 0, 4]
    # ceil(log2(v)) for v>0 else 0
    assert out["exp_bucket"].to_pylist() == [3, 6, 7, 0, 9]


def test_body_normalize_fallback_chain():
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "props": ['{"k": 87, "a": 1}', "not json {", "", '{"bad": }'],
        }
    )
    out = normalize_body_batch(t)
    assert out["body_kind"].to_pylist() == ["map", "string", "empty", "string"]
    assert out["body"].to_pylist()[0] == '{"a":1,"k":87}'  # canonical sorted keys
    assert out["body"].to_pylist()[1] == "not json {"  # string fallback
    assert out["body_keys"].to_pylist()[0] == "a,k"
    assert out["body_keys"].to_pylist()[1] is None


def test_write_typed_sinks(tmp_path):
    # K4 "5 typed tables": one parquet directory per metric model
    import os

    import ray.data

    from sts_opentelemetry_collector_ray.stages.metrics_dispatch import write_typed_sinks

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "typed")
    write_typed_sinks(ds, out)
    models = sorted(d.split("=")[1] for d in os.listdir(out) if d.startswith("model="))
    assert models == ["exp_histogram", "gauge", "histogram", "sum", "summary"]
