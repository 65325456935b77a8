"""Service-graph analogue tests (connector_test.go / store_test.go translation):
pairing semantics, failed counting, latency bucketing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from sts_opentelemetry_collector_ray.stages.parse import parse_batch
from sts_opentelemetry_collector_ray.stages.servicegraph import (
    DEFAULT_LATENCY_BOUNDS,
    edge_table,
    latency_histogram,
    red_metrics,
)


def make_ds(rows):
    t = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": [r[2] for r in rows],
            "text": [r[3] for r in rows],
            "tool": [r[4] for r in rows],
            "ts": pa.array([np.datetime64(r[5], "us") for r in rows], pa.timestamp("us")),
        }
    )
    return ray.data.from_arrow(parse_batch(t))


def test_edge_pairing_and_red():
    ds = make_ds(
        [
            # caller at turn 0 → tool turn 1 (pairs; 0.5 s latency)
            ("c1", 0, "assistant", "[INFO] go call:bash(q1)", "", "2024-01-01T00:00:00.000000"),
            ("c1", 1, "tool", "[INFO] result k=1", "bash", "2024-01-01T00:00:00.500000"),
            # caller at turn 2 names tool search but next turn is bash → NO pair
            ("c1", 2, "assistant", "[INFO] go call:search(q2)", "", "2024-01-01T00:00:01.000000"),
            ("c1", 3, "tool", "[INFO] other k=2", "bash", "2024-01-01T00:00:02.000000"),
            # failed edge (server severity ERROR), different conv, 3 s latency
            ("c2", 0, "user", "[INFO] run call:bash(q3)", "", "2024-01-01T00:00:00.000000"),
            ("c2", 1, "tool", "[ERROR] boom k=3", "bash", "2024-01-01T00:00:03.000000"),
            # tool turn with no preceding caller → NO pair
            ("c3", 5, "tool", "[INFO] orphan k=4", "search", "2024-01-01T00:00:00.000000"),
        ]
    )
    edges = edge_table(ds).to_pandas().sort_values(["conv_id"]).reset_index(drop=True)
    assert len(edges) == 2
    assert edges.loc[0, "conv_id"] == "c1" and edges.loc[0, "failed"] == 0
    assert edges.loc[0, "latency_us"] == 500_000
    assert edges.loc[1, "conv_id"] == "c2" and edges.loc[1, "failed"] == 1
    assert edges.loc[1, "client_role"] == "user"

    red = red_metrics(edge_table(ds)).to_pandas()
    bash = red[red["tool"] == "bash"]
    assert bash["n"].sum() == 2 and bash["failed"].sum() == 1


def test_latency_bucket_semantics():
    # searchsorted 'left' == Go sort.SearchFloat64s (connector.go:456-479)
    assert np.searchsorted(DEFAULT_LATENCY_BOUNDS, 0.5, side="left") == 9
    assert np.searchsorted(DEFAULT_LATENCY_BOUNDS, 0.002, side="left") == 0
    assert np.searchsorted(DEFAULT_LATENCY_BOUNDS, 100.0, side="left") == 16
    ds = make_ds(
        [
            ("c1", 0, "assistant", "[INFO] x call:bash(q1)", "", "2024-01-01T00:00:00.000000"),
            ("c1", 1, "tool", "[INFO] y k=1", "bash", "2024-01-01T00:00:00.500000"),
        ]
    )
    hist = latency_histogram(edge_table(ds)).to_pandas()
    assert hist.iloc[0]["bucket_idx"] == 9 and hist.iloc[0]["n"] == 1


def test_native_join_variant_matches_bucket_join(ray_session):
    """edge_table (explicit bucket exchange) and edge_table_native_join (Ray's
    built-in hash join) must produce identical edge sets."""
    from sts_opentelemetry_collector_ray.sources import generate_transcripts
    from sts_opentelemetry_collector_ray.stages.parse import parse_stage
    from sts_opentelemetry_collector_ray.stages.servicegraph import (
        edge_table_native_join,
    )
    import ray.data

    out = "/tmp/sg_native_join_corpus"
    generate_transcripts(out, n_turns=3000, seed=42)
    parsed = parse_stage(ray.data.read_parquet(out))
    a = edge_table(parsed).to_pandas()
    parsed2 = parse_stage(ray.data.read_parquet(out))
    b = edge_table_native_join(parsed2, num_partitions=4).to_pandas()
    key = ["conv_id", "client_turn"]
    cols = ["conv_id", "client_turn", "server_turn", "client_role", "tool", "failed", "latency_us"]
    aa = a[cols].sort_values(key).reset_index(drop=True)
    bb = b[cols].sort_values(key).reset_index(drop=True)
    for c in cols:
        aa[c] = aa[c].astype(bb[c].dtype) if aa[c].dtype != bb[c].dtype else aa[c]
    pd.testing.assert_frame_equal(aa, bb)
    assert len(aa) > 0


def test_find_database_resolution_chain():
    """connector.go:721-744: peer.service > db.name > redis+index > db.system;
    no db.system ⇒ null."""
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.stages.servicegraph import (
        resolve_database_name,
    )

    sys_ = pa.array([None, "postgres", "postgres", "redis", "redis", "mysql"])
    peer = pa.array(["p", "peer-db", None, None, None, None])
    name = pa.array([None, "orders", "orders", None, "cache", None])
    ridx = pa.array([None, None, None, "3", "9", None])
    out = resolve_database_name(sys_, peer, name, ridx).to_pylist()
    assert out == [None, "peer-db", "orders", "redis 3", "cache", "mysql"]
