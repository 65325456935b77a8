"""Per-partition checkpoint manifests — lineage, metrics, idempotent resume.

The reference delegates durability to Kafka offsets and compacted topics and keeps a
first-seen stream registry (reference:
extension/settingsproviderextension/internal/provider/kafka/kafka_settings_provider.go:
60-74 AutoCommitMarks; connector/topologyconnector/internal/topology_stream_publisher.go:
31-118 known-streams set; metadata self-healing metadata_publisher.go:19-24). A batch
engine's equivalent is explicit: every completed input partition writes a small JSON
manifest recording

- **lineage**: the exact input files (path/size/mtime) and their fingerprint, plus the
  ruleset fingerprint — a resumed run can never silently mix rule versions (the
  snapshot-swap hazard, snapshot_manager.go:154-213);
- **metrics**: per-sink routed-row counts, error-row count, wall seconds per stage —
  the per-stage telemetry counters of the reference (metrics/metrics.go) reduced per
  partition;
- **completion**: manifests are written atomically (tmp + rename) AFTER the
  partition's output, so a manifest's existence proves the partition is durable.

On resume, a partition is skipped iff its manifest exists and both fingerprints match;
otherwise its output directory is overwritten idempotently.
"""

from __future__ import annotations

import json
import os
import time

from ..functions.hashing import fnv1a64


def fingerprint_files(paths: list[str]) -> tuple[str, list[dict]]:
    entries = []
    for p in sorted(paths):
        st = os.stat(p)
        entries.append({"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns})
    blob = json.dumps(entries, sort_keys=True)
    return format(fnv1a64(blob), "016x"), entries


def ruleset_fingerprint(rules) -> str:
    blob = json.dumps([repr(r.rule) for r in rules], sort_keys=True)
    return format(fnv1a64(blob), "016x")


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{pid:05d}.json")


def load_manifest(out_dir: str, pid: int) -> dict | None:
    p = manifest_path(out_dir, pid)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn write ⇒ treat as incomplete, reprocess idempotently


def write_manifest(out_dir: str, pid: int, payload: dict) -> None:
    p = manifest_path(out_dir, pid)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    payload = dict(payload, completed_at=time.time())
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, p)
