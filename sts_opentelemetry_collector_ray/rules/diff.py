"""Settings snapshot diffing — removal tombstones on ruleset change.

The reference's SnapshotManager diffs consecutive settings snapshots by mapping
identifier and, for each removed mapping, emits a Remove message to EVERY shard of
that mapping's data source plus a metadata tombstone (reference:
extension/settingsproviderextension → connector/topologyconnector/internal/
snapshot_manager.go:154-213; message_builder.go:85-110 removal fan-out;
metadata_publisher.go:100-110).

Batch translation: a ruleset change is a run boundary — `ruleset_diff` compares the
previous run's ruleset fingerprint manifest against the current rules and produces
the tombstone rows a downstream sink needs to retire stale data sources. Changed
rules (same identifier, different expressions) count as removed+added, exactly like
the reference (snapshot_manager.go compares serialized settings)."""

from __future__ import annotations

import pyarrow as pa

from .. import SHARD_COUNT
from .model import CompiledRule


def ruleset_identifiers(rules: list[CompiledRule]) -> dict[str, str]:
    """identifier → repr fingerprint (serialized-settings comparison analogue)."""
    return {r.rule.identifier: repr(r.rule) for r in rules}


def ruleset_diff(
    old: list[CompiledRule] | dict[str, str],
    new: list[CompiledRule],
) -> tuple[list[str], list[str], pa.Table]:
    """Returns (removed_ids, added_ids, tombstone_table).

    Tombstones: one row per (removed data_source, shard 0..SHARD_COUNT-1) with
    action REMOVE — the all-shards fan-out of message_builder.go:85-110."""
    old_map = old if isinstance(old, dict) else ruleset_identifiers(old)
    new_map = ruleset_identifiers(new)
    removed = sorted(
        k for k, v in old_map.items() if k not in new_map or new_map[k] != v
    )
    added = sorted(
        k for k, v in new_map.items() if k not in old_map or old_map[k] != v
    )
    rows = {
        "data_source": [],
        "shard_id": [],
        "action": [],
    }
    for ds_id in removed:
        for shard in range(SHARD_COUNT):
            rows["data_source"].append(ds_id)
            rows["shard_id"].append(str(shard))
            rows["action"].append("REMOVE")
    table = pa.table(
        {
            "data_source": pa.array(rows["data_source"], pa.string()),
            "shard_id": pa.array(rows["shard_id"], pa.string()),
            "action": pa.array(rows["action"], pa.string()),
        }
    )
    return removed, added, table
