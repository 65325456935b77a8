#!/usr/bin/env python
"""Cluster entry point for the flagship pipeline — the script you hand to
``ray job submit`` on a real multi-node cluster:

    ray job submit --working-dir . -- \
        python scripts/run_flagship.py \
            --input /data/transcripts --out /data/routed \
            --partitions 4096 --partition-parallelism 8 --resume

On the fixed-size cluster the job connects to the running Ray instance
(``ray.init(address="auto")``); standalone (no cluster) it starts a local
session. This script OWNS its Ray session per the repo contract — library code
never calls ray.init().

Checkpoint/resume: `flagship_run` skips every partition whose manifest matches
the input + ruleset fingerprints, so re-submitting the SAME job after a node
failure (or preemption) resumes idempotently; `--no-resume` clears the output
directory first — but refuses if the directory is non-empty and has no
`_manifests/` marker (a mistyped --out must not wipe a data directory).
Exit code 0 only if every partition completed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="directory of transcript parquet files")
    ap.add_argument("--out", required=True, help="output root (hive layout + manifests)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="input partition count (default: n_files/4)")
    ap.add_argument("--partition-parallelism", type=int, default=2,
                    help="overlapping partition sub-pipelines")
    ap.add_argument("--enrich-concurrency", type=int, default=4)
    ap.add_argument("--salt-span", type=int, default=None,
                    help="hot-conversation salting span (skew mitigation)")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--no-sort", action="store_true")
    ap.add_argument("--resume", action="store_true", default=True,
                    help="skip partitions with matching manifests (default)")
    ap.add_argument("--no-resume", dest="resume", action="store_false",
                    help="clear the output directory and start fresh")
    ap.add_argument("--ruleset-policy", choices=["invalidate", "keep"],
                    default="invalidate")
    args = ap.parse_args()

    if not args.resume and os.path.exists(args.out):
        # Refuse to delete a directory that doesn't look like prior flagship
        # output (no _manifests marker): a mistyped --out must not silently
        # wipe a data directory. An empty dir is fine to clear.
        looks_like_ours = os.path.isdir(os.path.join(args.out, "_manifests"))
        if not looks_like_ours and os.listdir(args.out):
            print(
                f"--no-resume: refusing to delete {args.out!r}: it is non-empty "
                "and has no _manifests/ marker, so it doesn't look like prior "
                "flagship output. Remove it manually if you really mean it.",
                file=sys.stderr,
            )
            return 2
        shutil.rmtree(args.out, ignore_errors=True)

    import ray

    if not ray.is_initialized():
        # on a cluster (ray job submit): attach to the running instance;
        # standalone: local session
        try:
            ray.init(address="auto", ignore_reinit_error=True,
                     include_dashboard=False, logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", ignore_reinit_error=True,
                     include_dashboard=False, logging_level="ERROR")

    from sts_opentelemetry_collector_ray.pipelines.flagship import flagship_run

    try:
        res = flagship_run(
            args.input,
            args.out,
            num_partitions=args.partitions,
            dedup=not args.no_dedup,
            sort_output=not args.no_sort,
            enrich_concurrency=args.enrich_concurrency,
            partition_parallelism=args.partition_parallelism,
            salt_span=args.salt_span,
            ruleset_policy=args.ruleset_policy,
        )
        print(json.dumps({
            "partitions_total": res.partitions_total,
            "partitions_skipped": res.partitions_skipped,
            "routed_rows": res.routed_rows,
            "error_rows": res.error_rows,
            "wall_sec": round(res.wall_sec, 2),
            "out_dir": res.out_dir,
        }))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
