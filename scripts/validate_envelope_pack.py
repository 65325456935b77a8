#!/usr/bin/env python
"""Independent validation of `envelope_pack` at scales the SQL oracle can't run.

The DuckDB oracle for envelope_pack replays greedy byte-capped coalescing with
a RECURSIVE CTE; DuckDB materializes every iteration, which exceeds host RAM
at sf0.1 (documented in BASELINE.md). This script validates the operator there
instead with an independent PYTHON replay: a plain row-loop greedy packer
(accumulate size, cut at cap / non-CREATE solo rows, first-seen order per
(data_source, shard_id, conv-range bucket), dense renumber per (ds, shard)) —
the same semantics as `stages/pack.py::_pack_group` but none of its vectorized
kernel code, so agreement is evidence, not tautology.

    python scripts/validate_envelope_pack.py [sf_dir]   # default sf0.1

Owns its Ray session per the repo contract (library code never ray.init()s).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

ROW_OVERHEAD = 64
SIZE_COLS = ["external_id", "name", "type_name", "tags", "text"]


def replay_pack(routed: pd.DataFrame, cap: int, convs_per_bucket: int) -> pd.DataFrame:
    df = routed.copy()
    conv_num = (
        df["conv_id"].str.replace(r"\D+", "", regex=True).replace("", "0").astype(np.int64)
    )
    df["_bucket"] = conv_num // convs_per_bucket
    size = np.full(len(df), ROW_OVERHEAD, dtype=np.int64)
    for c in SIZE_COLS:
        if c in df.columns:
            size += df[c].fillna("").str.len().to_numpy(dtype=np.int64)
    df["_size"] = size

    out_rows = []
    for (ds, sh, b), g in df.groupby(["data_source", "shard_id", "_bucket"], sort=True):
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        env, acc, cur_rows = 0, 0, 0
        first = None
        envs = []  # (env, n_rows, bytes, first_conv, first_turn)
        for conv, turn, action, sz in zip(
            g["conv_id"], g["turn_idx"], g.get("action", pd.Series(["CREATE"] * len(g))),
            g["_size"],
        ):
            solo = action != "CREATE"
            if solo:
                if cur_rows:
                    envs.append((env, cur_rows, acc, *first))
                    env += 1
                envs.append((env, 1, int(sz), conv, turn))
                env += 1
                acc, cur_rows, first = 0, 0, None
                continue
            if cur_rows and acc + sz > cap:
                envs.append((env, cur_rows, acc, *first))
                env += 1
                acc, cur_rows, first = 0, 0, None
            if not cur_rows:
                first = (conv, turn)
            acc += int(sz)
            cur_rows += 1
        if cur_rows:
            envs.append((env, cur_rows, acc, *first))
        for e, n, by, fc, ft in envs:
            out_rows.append((ds, sh, b, e, n, by, fc, ft))
    rep = pd.DataFrame(
        out_rows,
        columns=["data_source", "shard_id", "bucket", "envelope_idx", "n_rows",
                 "bytes", "first_conv", "first_turn"],
    )
    # dense renumber per (ds, shard): bucket-ordered prefix offsets
    counts = (
        rep.groupby(["data_source", "shard_id", "bucket"], as_index=False)
        .size().sort_values(["data_source", "shard_id", "bucket"])
    )
    counts["off"] = counts.groupby(["data_source", "shard_id"])["size"].cumsum() - counts["size"]
    rep = rep.merge(counts[["data_source", "shard_id", "bucket", "off"]],
                    on=["data_source", "shard_id", "bucket"])
    rep["envelope_idx"] = rep["envelope_idx"] + rep["off"]
    return rep.drop(columns=["bucket", "off"])


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sts_opentelemetry_collector_ray import ENVELOPE_MAX_BYTES
    from sts_opentelemetry_collector_ray.pipelines.queries2 import q_envelope_pack
    from sts_opentelemetry_collector_ray.pipelines import routed_dataset
    from sts_opentelemetry_collector_ray.sources import derive_transcripts_from_events
    from sts_opentelemetry_collector_ray.stages.pack import CONVS_PER_BUCKET

    t0 = time.time()
    got = q_envelope_pack(sf).to_pandas()
    t_ray = time.time() - t0

    t0 = time.time()
    routed = routed_dataset(
        derive_transcripts_from_events(sf), dedup=False, enrich_concurrency=2
    ).to_pandas()  # one-off validation only: driver-side replay needs the rows
    want = replay_pack(routed, ENVELOPE_MAX_BYTES, CONVS_PER_BUCKET)
    t_replay = time.time() - t0

    key = ["data_source", "shard_id", "envelope_idx"]
    got = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    want = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    want = want.astype({c: got[c].dtype for c in got.columns})
    pd.testing.assert_frame_equal(got[want.columns], want)
    print(
        f"envelope_pack OK at {sf}: {len(got)} envelopes over {len(routed)} routed rows "
        f"(ray {t_ray:.1f}s, python replay {t_replay:.1f}s) — exact frame equality"
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
