"""Benchmark harness.

Runs the headline flagship pipeline (parse → enrich → route → dedup → sort → write +
aggregate) over a deterministic transcript corpus sized to $GRAFT_SF_DIR, plus the key
driver queries, and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns": T, "turns_per_sec": ...}

`bench.py --scaling` runs the headline pipeline twice in fresh processes at
num_cpus=4 and num_cpus=16 by default (GRAFT_SCALE_LO/HI override) on the same
input and reports both throughputs plus scaling efficiency — the sandbox
stand-in for the N vs 4N node cluster criterion; see run_scaling's docstring
and BASELINE.md for why 4/16 rather than 8/32 on one box.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def corpus_turns_for(sf_dir: str) -> int:
    """Deterministic corpus size ∝ scale factor (default 30× the events row
    count; the --scaling path raises GRAFT_TURNS_MULT to 240 — a 24M-turn corpus
    at sf0.1 — so per-stage compute dominates fixed scheduling overhead and the
    measurement reflects the pipeline, not Ray session setup)."""
    import pyarrow.parquet as pq

    mult = int(os.environ.get("GRAFT_TURNS_MULT", "30"))
    n_events = pq.read_metadata(os.path.join(sf_dir, "events.parquet")).num_rows
    return max(10_000, n_events * mult)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from sts_opentelemetry_collector_ray.pipelines import flagship_run
    from sts_opentelemetry_collector_ray.pipelines.queries import QUERIES
    from sts_opentelemetry_collector_ray.sources import transcripts_path_for

    n_turns = corpus_turns_for(SF_DIR)
    corpus = transcripts_path_for(n_turns, seed=42)

    # Warm the OS page cache (untimed) so we measure compute + shuffle, not first I/O.
    import glob as _glob

    for f in _glob.glob(os.path.join(corpus, "*.parquet")):
        with open(f, "rb") as fh:
            fh.read()

    out_dir = f"/tmp/sts_ray_bench/flagship_n{n_turns}_c{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    pool = max(2, NUM_CPUS // 4)
    t0 = time.time()
    res = flagship_run(
        corpus,
        out_dir,
        # partitions scale with corpus (ceil) so one partition's materialized
        # routed output (~2× input bytes) never exceeds the ~6M-turn budget
        num_partitions=max(2, -(-n_turns // 6_000_000)),
        partition_parallelism=2,  # overlap partition sub-pipelines: one partition's
        # shuffle barrier is filled by the next partition's read/route stages
        enrich_concurrency=pool,
        route_concurrency=None,  # stateless router tasks: fully elastic
    )
    headline = time.time() - t0

    queries = {}
    for name in ("route_fanout", "agg_counts", "q1_pricing", "events_hourly"):
        t0 = time.time()
        out = QUERIES[name](SF_DIR)
        # consume the result without materializing big data on the driver
        n = out.count() if hasattr(out, "count") else len(out)
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "flagship parse→enrich→route→dedup→sort→write+aggregate wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": n_turns,
        "routed_rows": res.routed_rows,
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, same input, fresh ray.init sessions at N and 4N CPUs.

    N=4 → 4N=16 by default: in this single-node sandbox the object store (one
    /dev/shm, one disk) is shared by every worker, so beyond ~16 cores the
    pipeline's shuffle becomes bandwidth-bound — a resource that scales WITH
    nodes on a real cluster but not with cores on one box. 4→16 measures the
    CPU-scaling regime the cluster criterion is about; override with
    GRAFT_SCALE_LO/HI to reproduce other pairs (8/32 reported in BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_TURNS_MULT=os.environ.get("GRAFT_TURNS_MULT", "240"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    r_lo, r_hi = run(lo), run(hi)
    thr_lo, thr_hi = r_lo["turns_per_sec"], r_hi["turns_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": f"scaling efficiency (turns/sec at {lo} vs {hi} CPUs, fresh sessions)",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"turns_per_sec_{lo}": thr_lo,
        f"turns_per_sec_{hi}": thr_hi,
        "scaling_efficiency": round(eff, 3),
        "turns": r_hi["turns"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
