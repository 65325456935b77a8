"""Checkpoint/resume for the iterative graph engine: an interrupted
pagerank_integer run resumed from its round manifest must be BIT-IDENTICAL
to an uninterrupted run (integer arithmetic makes this exact), and the
resume must actually skip completed rounds."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from sts_opentelemetry_collector_ray.stages.graph import pagerank_integer


def _edges():
    # a small digraph with a cycle and a dangling sink
    src = [1, 1, 2, 3, 3, 4, 5]
    dst = [2, 3, 3, 1, 4, 5, 1]
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


def _ranks_df(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return df.astype({"node": np.int64, "rank_int": np.int64})


def test_resume_is_bit_identical(tmp_path):
    full = _ranks_df(pagerank_integer(_edges(), iterations=6))

    ck = str(tmp_path / "ck")
    # "crash" after 3 rounds
    pagerank_integer(_edges(), iterations=3, checkpoint_dir=ck)
    m = json.load(open(os.path.join(ck, "MANIFEST.json")))
    assert m["round"] == 3
    assert os.path.isdir(os.path.join(ck, "round=3"))

    # resume to 6: rounds 4..6 run on top of the persisted state
    resumed = _ranks_df(
        pagerank_integer(_edges(), iterations=6, checkpoint_dir=ck)
    )
    pd.testing.assert_frame_equal(resumed, full)
    assert json.load(open(os.path.join(ck, "MANIFEST.json")))["round"] == 6


def test_completed_checkpoint_runs_zero_rounds(tmp_path):
    ck = str(tmp_path / "ck")
    first = _ranks_df(pagerank_integer(_edges(), iterations=4, checkpoint_dir=ck))
    # a rerun at the same iteration count replays NOTHING: the returned state
    # equals round-4 parquet verbatim
    again = _ranks_df(pagerank_integer(_edges(), iterations=4, checkpoint_dir=ck))
    pd.testing.assert_frame_equal(again, first)
    # the directory has exactly rounds 1..4
    rounds = sorted(d for d in os.listdir(ck) if d.startswith("round="))
    assert rounds == [f"round={k}" for k in range(1, 5)]


def test_mismatched_node_count_ignores_checkpoint(tmp_path):
    ck = str(tmp_path / "ck")
    pagerank_integer(_edges(), iterations=2, checkpoint_dir=ck)
    # a DIFFERENT graph with the same checkpoint dir: the stale manifest
    # (wrong n_nodes) must be ignored, not loaded
    other = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3], pa.int64()),
                "dst": pa.array([2, 3, 4], pa.int64()),
            }
        )
    )
    got = _ranks_df(pagerank_integer(other, iterations=2, checkpoint_dir=ck))
    clean = _ranks_df(pagerank_integer(other, iterations=2))
    pd.testing.assert_frame_equal(got, clean)


def test_lpa_resume_is_bit_identical(tmp_path):
    from sts_opentelemetry_collector_ray.stages.graph import (
        label_propagation_sync,
    )

    def run(**kw):
        ds = label_propagation_sync(_edges(), rounds=4, **kw)
        return (
            ds.to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
            .astype({"node": np.int64, "community": np.int64})
        )

    full = run()
    ck = str(tmp_path / "lpa")
    label_propagation_sync(_edges(), rounds=2, checkpoint_dir=ck).materialize()
    assert json.load(open(os.path.join(ck, "MANIFEST.json")))["round"] == 2
    resumed = run(checkpoint_dir=ck)
    pd.testing.assert_frame_equal(resumed, full)
