"""The flagship pipeline: parse → enrich → route → dedup → sort → write + aggregate.

The Ray-Data-native re-expression of the reference's telemetry → topology-stream →
Kafka path (reference: test/e2e/templates/collector-config.yaml.tmpl:31-46 wiring;
connector/topologyconnector/internal/pipeline.go:102-150 core loop;
message_builder.go:259-263 shard keying; SURVEY.md §3.1):

    read_parquet (pruned columns)
      → map_batches(parse)                 zero-copy Arrow regex extraction
      → map_batches(EnrichActor, pool)     broadcast lookup tables, once per actor
      → map_batches(Router, pool)          compiled ruleset fan-out + error rows
      → dedup (bucketed first-wins)        projection-hash gate
      → sort(sink, conv_id, turn_idx, data_source)
      → write_parquet(part=<pid>/, partition_cols=[sink])
      + sink_counts partials → per-partition parquet, merged once at the end
      + per-partition lineage manifest     idempotent resume

Scale contract: the run is divided into input-file partitions processed as independent
streaming sub-pipelines (each one bounded by the object store, spilling as needed);
a partition is the unit of checkpointing, of ordering AND of dedup scope:

- per-conversation turn order is guaranteed within a partition, mirroring the
  reference's per-Kafka-partition ordering guarantee (message_builder.go:196-203);
- dedup suppression is exact within a partition and best-effort across partitions —
  faithfully mirroring the reference, whose dedup cache is per collector INSTANCE
  and TTL'd (deduplicator.go:52-205): duplicates across replicas/expiry windows are
  expected there and downstream consumers upsert idempotently. A conv-clustered
  input layout (one conversation per partition) makes conv-scoped dedup globally
  exact — `cluster_input_by_conv` produces that layout with one bounded
  exchange; `routed_dataset(dedup=True)` on an unpartitioned Dataset is the
  single-pipeline globally-exact variant.

Skew note: the aggregate uses per-batch combiners (stages/aggregate.py), so hot
conversations never concentrate on one reducer; the sort is a range shuffle over
(sink, conv_id, turn_idx), where Ray's sort splits oversized ranges — hot conv_ids
spread across boundaries instead of hitting one task ("salting" is subsumed by
range-splitting on the composite key).
"""

from __future__ import annotations

import glob
import os
import re
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


from ..rules.model import CompiledRule, default_ruleset
from ..stages.dedup import finalize_routed
from ..stages.enrich import enrich_stage
from ..stages.parse import parse_stage
from ..stages.route import route_stage
from ..state.manifest import (
    fingerprint_files,
    load_manifest,
    ruleset_fingerprint,
    write_manifest,
)

SORT_KEY = ["sink", "conv_id", "turn_idx", "data_source"]


@dataclass
class FlagshipResult:
    out_dir: str
    partitions_total: int = 0
    partitions_skipped: int = 0
    routed_rows: int = 0
    error_rows: int = 0
    sink_rows: dict = field(default_factory=dict)
    wall_sec: float = 0.0


def routed_dataset(
    ds: "ray.data.Dataset",
    rules: list[CompiledRule] | None = None,
    enrich_concurrency: int = 4,
    route_concurrency: int | None = None,
    dedup: bool = True,
    salt_span: int | None = None,
) -> "ray.data.Dataset":
    """parse → enrich → route (→ dedup+order) as one lazy Dataset (no writes)."""
    out = route_stage(
        enrich_stage(parse_stage(ds), concurrency=enrich_concurrency),
        rules=rules,
        concurrency=route_concurrency,
    )
    if dedup:
        out = finalize_routed(out, rules=rules, salt_span=salt_span)
    return out


def cluster_input_by_conv(
    input_dir: str, out_dir: str, num_partitions: int = 8
) -> str:
    """Re-layout a transcript corpus so each output shard holds WHOLE
    conversations (``hash(conv_id) % num_partitions``). Running `flagship_run`
    over the clustered layout with ``num_partitions`` partitions makes the
    partition-scoped dedup GLOBALLY exact (no conversation straddles a
    partition) while keeping every partition-level property — checkpointing,
    ordering, resume.

    Streaming write: one bounded exchange (sort by shard) co-locates each
    shard's rows, then every BLOCK writes its own ``shard-<k>-part-*.parquet``
    files — task memory stays block-sized no matter how big a shard is (the
    old one-pandas-group-per-shard write held corpus/num_partitions rows in a
    single task). `_chunk` groups the files back by the shard prefix, so the
    shard ↔ flagship-partition mapping is unchanged."""
    import uuid

    import numpy as np

    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(sorted(glob.glob(os.path.join(input_dir, "*.parquet"))))

    def bucketize(t: pa.Table) -> pa.Table:
        b = (
            fnv1a32_arrow(t["conv_id"].combine_chunks())
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("_shard", pa.array(b, pa.int32()))

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shards, rows = [], []
        sid_col = t["_shard"]
        for sid in pc.unique(sid_col).to_pylist():
            part = t.filter(pc.equal(sid_col, sid)).drop_columns(["_shard"])
            name = f"shard-{sid:05d}-part-{uuid.uuid4().hex[:12]}.parquet"
            pq.write_table(
                part.replace_schema_metadata(None), os.path.join(out_dir, name)
            )
            shards.append(sid)
            rows.append(part.num_rows)
        return pa.table(
            {"shard": pa.array(shards, pa.int32()), "rows": pa.array(rows, pa.int64())}
        )

    counts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .sort("_shard")  # co-locate shards; blocks stay bounded (vs map_groups)
        .map_batches(write_block, batch_format="pyarrow")
        .to_pandas()
    )
    assert set(counts["shard"]) <= set(range(num_partitions))
    return out_dir


_SHARD_FILE = re.compile(r"shard-(\d+)(?:-part-[0-9a-f]+)?\.parquet$")


def _chunk(files: list[str], n_parts: int) -> list[list[str]]:
    """Partition the input file list. A `cluster_input_by_conv` layout (every
    file named ``shard-<k>[-part-*].parquet``) groups by shard id so whole
    conversations stay in one partition; anything else chunks by position."""
    matches = [_SHARD_FILE.search(os.path.basename(f)) for f in files]
    if files and all(matches):
        by_shard: dict[int, list[str]] = {}
        for f, m in zip(files, matches):
            by_shard.setdefault(int(m.group(1)), []).append(f)
        return [by_shard[k] for k in sorted(by_shard)]
    n_parts = max(1, min(n_parts, len(files)))
    size = (len(files) + n_parts - 1) // n_parts
    return [files[i : i + size] for i in range(0, len(files), size)]


def flagship_run(
    input_dir: str,
    out_dir: str,
    rules: list[CompiledRule] | None = None,
    num_partitions: int | None = None,
    dedup: bool = True,
    enrich_concurrency: int = 4,
    route_concurrency: int | None = None,
    sort_output: bool = True,
    max_partitions: int | None = None,  # test hook: stop after k (simulated failure)
    partition_parallelism: int = 2,
    output_partition_cols: list[str] | None = None,
    salt_span: int | None = None,
    ruleset_policy: str = "invalidate",
) -> FlagshipResult:
    """Run the flagship over ``input_dir``, checkpointing per input partition.

    ``partition_parallelism`` overlaps adjacent partition sub-pipelines (each is an
    independent streaming Dataset execution sharing the Ray session): while one
    partition sits in its shuffle barrier, the next partition's read/route stages
    fill the idle cores. Checkpoint semantics are unchanged — each partition still
    completes and writes its manifest atomically and independently.

    ``ruleset_policy`` selects the snapshot-swap semantics on resume
    (reference: snapshot_manager.go:154-213 — a new settings snapshot applies to
    SUBSEQUENT data; already-published data is retired via removal tombstones,
    not reprocessed):

    - ``"invalidate"`` (default, strict batch semantics): a changed ruleset
      invalidates every completed partition — the whole run reflects ONE
      snapshot version.
    - ``"keep"`` (the reference's hot-swap semantics): completed partitions
      written under the previous snapshot are kept (their manifests record
      which fingerprint produced them); only remaining partitions run under the
      new snapshot, and removal tombstones for dropped mappings are emitted as
      usual (``_tombstones/``)."""
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    rules = rules if rules is not None else default_ruleset()
    rfp = ruleset_fingerprint(rules)
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    parts = _chunk(files, num_partitions or max(1, len(files) // 4))
    result = FlagshipResult(out_dir=out_dir, partitions_total=len(parts))
    os.makedirs(out_dir, exist_ok=True)
    _emit_ruleset_tombstones(out_dir, rules)

    todo = []
    for pid, part_files in enumerate(parts):
        if max_partitions is not None and pid >= max_partitions:
            break
        ifp, entries = fingerprint_files(part_files)
        m = load_manifest(out_dir, pid)
        rules_ok = m is not None and (
            m.get("ruleset_fingerprint") == rfp or ruleset_policy == "keep"
        )
        if m and m.get("input_fingerprint") == ifp and rules_ok:
            result.partitions_skipped += 1
            _tally(result, m)
            continue
        todo.append((pid, part_files, ifp, entries))

    def work(item):
        pid, part_files, ifp, entries = item
        pm = _run_partition(
            pid, part_files, out_dir, rules,
            dedup=dedup, sort_output=sort_output,
            enrich_concurrency=enrich_concurrency,
            route_concurrency=route_concurrency,
            output_partition_cols=output_partition_cols,
            salt_span=salt_span,
        )
        pm.update(input_fingerprint=ifp, ruleset_fingerprint=rfp, input_files=entries)
        write_manifest(out_dir, pid, pm)
        return pm

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, partition_parallelism)) as pool:
            for pm in pool.map(work, todo):
                _tally(result, pm)

    _merge_aggregates(out_dir, len(parts), max_partitions)
    result.wall_sec = time.time() - t0
    return result


def _emit_ruleset_tombstones(out_dir: str, rules) -> None:
    """Settings-snapshot swap path (reference: connector.go:188-217 →
    snapshot_manager.go:154-213 diff → message_builder.go:85-110 removal fan-out):
    compare this run's ruleset against the previous run's recorded identifiers;
    for every removed/changed mapping write Remove tombstone rows (one per shard)
    under ``_tombstones/`` so downstream sinks can retire the stale data source."""
    import json as _json

    from ..rules.diff import ruleset_diff, ruleset_identifiers

    reg_path = os.path.join(out_dir, "_ruleset.json")
    prev: dict[str, str] = {}
    if os.path.exists(reg_path):
        try:
            with open(reg_path) as f:
                prev = _json.load(f)
        except (OSError, ValueError):
            prev = {}
    if prev:
        removed, _, tomb = ruleset_diff(prev, rules)
        if removed:
            tdir = os.path.join(out_dir, "_tombstones")
            os.makedirs(tdir, exist_ok=True)
            pq.write_table(
                tomb, os.path.join(tdir, f"tombstones-{int(time.time() * 1000)}.parquet")
            )
    tmp = reg_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(ruleset_identifiers(rules), f, indent=1, sort_keys=True)
    os.replace(tmp, reg_path)


def _tally(result: FlagshipResult, manifest: dict) -> None:
    result.routed_rows += manifest.get("routed_rows", 0)
    result.error_rows += manifest.get("error_rows", 0)
    for sink, n in manifest.get("sink_rows", {}).items():
        result.sink_rows[sink] = result.sink_rows.get(sink, 0) + n


def _run_partition(
    pid: int,
    files: list[str],
    out_dir: str,
    rules,
    dedup: bool,
    sort_output: bool,
    enrich_concurrency: int,
    route_concurrency: int,
    output_partition_cols: list[str] | None = None,
    salt_span: int | None = None,
) -> dict:
    t0 = time.time()
    part_dir = os.path.join(out_dir, f"part-{pid:05d}")
    ds = ray.data.read_parquet(files)
    routed = routed_dataset(
        ds, rules,
        enrich_concurrency=enrich_concurrency,
        route_concurrency=route_concurrency,
        dedup=dedup,
        salt_span=salt_span,
    )
    # dedup=True already yields bucket-sorted output (finalize_routed: dedup and
    # ordering share one shuffle); only the no-dedup path needs an explicit sort.
    if sort_output and not dedup:
        routed = routed.sort(SORT_KEY)
    t_route = time.time()
    # ONE streaming consumption: the RoutedParquetDatasink writes the hive
    # per-sink layout AND computes the (sink, role, tool) combiner counts +
    # lineage key range in the same pass — no partition-sized materialize, no
    # second execution (object-store pressure bounded by in-flight blocks).
    from ..sinks import RoutedParquetDatasink

    sink = RoutedParquetDatasink(
        os.path.join(part_dir, "routed"),
        # default ["sink"]; pass ["sink", "shard_id"] for the reference's exact
        # keyed layout out/<sink>/shard_id=<k>/ (stskafkaexporter keying, K1)
        partition_cols=tuple(output_partition_cols or ["sink"]),
    )
    routed.write_datasink(sink)
    t_write = time.time()

    agg_tbl = sink.agg_counts
    agg_dir = os.path.join(part_dir, "agg_counts")
    if os.path.isdir(agg_dir):
        for f in glob.glob(os.path.join(agg_dir, "*.parquet")):
            os.remove(f)
    os.makedirs(agg_dir, exist_ok=True)
    pq.write_table(agg_tbl, os.path.join(agg_dir, "agg_counts-00000.parquet"))
    sink_rows: dict[str, int] = {}
    err_rows = 0
    for row in agg_tbl.to_pylist():
        sink_rows[row["sink"]] = sink_rows.get(row["sink"], 0) + row["n"]
        err_rows += row["err"]
    first_key = sink.first_key
    last_key = sink.last_key
    t_agg = time.time()
    return {
        "pid": pid,
        "routed_rows": int(sum(sink_rows.values())),
        "error_rows": err_rows,
        "sink_rows": sink_rows,
        "first_conv_id": first_key,
        "last_conv_id": last_key,
        "stage_wall_sec": {
            "route_sort_write": round(t_write - t0, 3),
            "plan": round(t_route - t0, 3),
            "aggregate": round(t_agg - t_write, 3),
        },
    }


def _merge_aggregates(out_dir: str, n_parts: int, max_partitions: int | None) -> None:
    """Final tiny reduce: sum the per-partition partials into agg_counts/."""
    import duckdb

    limit = n_parts if max_partitions is None else min(n_parts, max_partitions)
    partial_glob = [
        os.path.join(out_dir, f"part-{pid:05d}", "agg_counts", "*.parquet")
        for pid in range(limit)
        if glob.glob(os.path.join(out_dir, f"part-{pid:05d}", "agg_counts", "*.parquet"))
    ]
    if not partial_glob:
        return
    con = duckdb.connect()
    files = [f for g in partial_glob for f in glob.glob(g)]
    tbl = con.execute(
        "SELECT sink, role, tool, CAST(SUM(n) AS BIGINT) AS n "
        "FROM read_parquet($files) GROUP BY ALL ORDER BY sink, role, tool",
        {"files": files},
    ).arrow()
    final_dir = os.path.join(out_dir, "agg_counts")
    os.makedirs(final_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(final_dir, "agg_counts.parquet"))
