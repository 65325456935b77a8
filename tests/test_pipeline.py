"""Pipeline-level golden tests (SURVEY.md §5: full signal → expected outputs, resume,
determinism, per-turn ordering)."""

import glob
import json
import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from sts_opentelemetry_collector_ray.pipelines import flagship_run


NUM_PARTS = 2


@pytest.fixture(scope="module")
def multi_file_transcripts(tmp_path_factory):
    """Multi-file corpus so partitioned runs exercise real partition boundaries."""
    from sts_opentelemetry_collector_ray.sources import generate_transcripts

    out = str(tmp_path_factory.mktemp("transcripts_mf"))
    generate_transcripts(out, n_turns=5000, seed=42, rows_per_file=1024)
    return out


@pytest.fixture(scope="module")
def flagship_out(multi_file_transcripts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship"))
    res = flagship_run(
        multi_file_transcripts, out, num_partitions=NUM_PARTS,
        enrich_concurrency=2,
    )
    return out, res


def partition_chunks(transcripts_dir: str, n_parts: int = NUM_PARTS):
    from sts_opentelemetry_collector_ray.pipelines.flagship import _chunk

    files = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
    return _chunk(files, n_parts)


def read_routed(out_dir: str) -> pd.DataFrame:
    frames = []
    for part in sorted(glob.glob(os.path.join(out_dir, "part-*/routed"))):
        df = duckdb.sql(
            f"select * from read_parquet('{part}/**/*.parquet', hive_partitioning=1)"
        ).df()
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def oracle_routed(files_or_dir) -> pd.DataFrame:
    """Pure-pandas oracle of the default ruleset over the raw corpus (independent
    reimplementation of parse→route→dedup used for set-equality checks). Accepts a
    directory (global scope) or an explicit file list (one partition's scope —
    dedup is partition-scoped in flagship_run, mirroring the reference's
    per-instance dedup cache)."""
    if isinstance(files_or_dir, str):
        files = sorted(glob.glob(f"{files_or_dir}/*.parquet"))
    else:
        files = list(files_or_dir)
    raw = pd.concat(
        [pq.read_table(f).to_pandas() for f in files],
        ignore_index=True,
    )
    sev = raw["text"].str.extract(r"^\[([A-Z]+)\]", expand=False).fillna("UNKNOWN")
    m = raw["text"].str.extract(r"call:([a-z]+)\(([^)]*)\)")
    rows = []
    for i in range(len(raw)):
        r = raw.iloc[i]
        s = sev.iloc[i]
        base = dict(conv_id=r["conv_id"], turn_idx=r["turn_idx"])
        rows.append(dict(base, sink="logs_all", data_source="urn:mapping:all-turns", action="CREATE"))
        if s == "ERROR":
            rows.append(dict(base, sink="logs_errors", data_source="urn:mapping:error-turns", action="CREATE"))
            rows.append(dict(base, sink="logs_errors", data_source="urn:mapping:bad-required", action="CREATE"))
        if r["tool"] != "" and r["role"] == "tool":
            rows.append(dict(base, sink="metrics_tools", data_source="urn:mapping:tool-calls", action="CREATE"))
        if s in ("WARN", "DEBUG"):
            rows.append(dict(base, sink="logs_diag", data_source="urn:mapping:diag-turns", action="CREATE"))
        if r["tool"] != "":
            rows.append(dict(base, sink="topology_relations", data_source="urn:mapping:conv-uses-tool", action="CREATE"))
        if s == "UNKNOWN":
            rows.append(dict(base, sink="logs_all", data_source="urn:mapping:session-delete", action="DELETE"))
    df = pd.DataFrame(rows)
    # Model the dedup gate (first-wins on each rule's referenced-field projection,
    # deduplicator.go:151-205): the relation rule references only (conv_id, tool) —
    # severity/turn are not in its expressions — so repeated (conv, tool) pairs
    # collapse to the first turn. Every other rule's projection includes
    # (conv_id, turn_idx) and is unique per turn; DELETE/error rows bypass the gate.
    rel = df["data_source"] == "urn:mapping:conv-uses-tool"
    raw_tool = raw.set_index(["conv_id", "turn_idx"])["tool"]
    rel_df = df[rel].copy()
    rel_df["tool"] = raw_tool.loc[
        pd.MultiIndex.from_frame(rel_df[["conv_id", "turn_idx"]])
    ].to_numpy()
    rel_df = rel_df.sort_values(["conv_id", "turn_idx"]).drop_duplicates(
        ["conv_id", "tool"], keep="first"
    ).drop(columns=["tool"])
    return pd.concat([df[~rel], rel_df], ignore_index=True)


def test_routed_set_equality_vs_oracle(flagship_out, multi_file_transcripts):
    out_dir, _ = flagship_out
    got = read_routed(out_dir)
    # partition-scoped oracle: dedup applies within each partition's file chunk
    exp = pd.concat(
        [oracle_routed(chunk) for chunk in partition_chunks(multi_file_transcripts)],
        ignore_index=True,
    )
    key = ["sink", "data_source", "action", "conv_id", "turn_idx"]
    g = got[key].sort_values(key).reset_index(drop=True)
    e = exp[key].sort_values(key).reset_index(drop=True)
    g["turn_idx"] = g["turn_idx"].astype("int64")
    e["turn_idx"] = e["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(g, e)


def test_per_turn_text_byte_equality(flagship_out, multi_file_transcripts):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering — the
    north-star per-row invariant."""
    out_dir, _ = flagship_out
    got = read_routed(out_dir)
    all_turns = got[got["data_source"] == "urn:mapping:all-turns"]
    raw = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{multi_file_transcripts}/*.parquet"))],
        ignore_index=True,
    )
    key = ["conv_id", "turn_idx"]
    g = all_turns.sort_values(key)[key + ["text"]].reset_index(drop=True)
    e = raw.sort_values(key)[key + ["text"]].reset_index(drop=True)
    g["turn_idx"] = g["turn_idx"].astype("int64")
    e["turn_idx"] = e["turn_idx"].astype("int64")
    assert (g["text"].to_numpy() == e["text"].to_numpy()).all()


def test_agg_counts_match_oracle(flagship_out, multi_file_transcripts):
    out_dir, _ = flagship_out
    agg = pq.read_table(os.path.join(out_dir, "agg_counts", "agg_counts.parquet")).to_pandas()
    exp = (
        pd.concat(
            [oracle_routed(c) for c in partition_chunks(multi_file_transcripts)],
            ignore_index=True,
        )
        .groupby("sink")
        .size()
        .rename("n")
        .reset_index()
    )
    got = agg.groupby("sink")["n"].sum().reset_index()
    merged = got.merge(exp, on="sink", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    # error rows (bad-required) have no severity routing difference; counts must match
    assert (merged["n_got"] == merged["n_exp"]).all(), merged


def test_output_files_ordered_within_conv(flagship_out):
    """Within every written parquet file, rows are sorted by the pipeline sort key —
    the per-partition ordering guarantee (message_builder.go:196-203 analogue)."""
    out_dir, _ = flagship_out
    files = glob.glob(os.path.join(out_dir, "part-*/routed/**/*.parquet"), recursive=True)
    assert files
    for f in files[:10]:
        df = pq.read_table(f, columns=["conv_id", "turn_idx", "data_source"]).to_pandas()
        # output blocks are whole sorted buckets: within a file every
        # (data_source, conv_id) run must be in turn order
        for _, g in df.groupby(["data_source", "conv_id"], sort=False):
            assert g["turn_idx"].is_monotonic_increasing, f


def test_manifests_and_resume(multi_file_transcripts, tmp_path):
    out = str(tmp_path / "resume")
    # simulate a failure after 1 of 2 partitions
    r1 = flagship_run(multi_file_transcripts, out, num_partitions=2, max_partitions=1,
                      enrich_concurrency=2)
    assert len(glob.glob(os.path.join(out, "_manifests", "*.json"))) == 1
    # resume completes the rest, skipping the finished partition
    r2 = flagship_run(multi_file_transcripts, out, num_partitions=2,
                      enrich_concurrency=2)
    assert r2.partitions_skipped == 1
    m = json.load(open(glob.glob(os.path.join(out, "_manifests", "*.json"))[0]))
    assert "input_fingerprint" in m and "ruleset_fingerprint" in m
    assert "sink_rows" in m and "stage_wall_sec" in m
    # the resumed output equals a from-scratch run (idempotent resume)
    ref_out = str(tmp_path / "ref")
    flagship_run(multi_file_transcripts, ref_out, num_partitions=2,
                 enrich_concurrency=2)
    key = ["sink", "data_source", "conv_id", "turn_idx", "action"]
    a = read_routed(out).sort_values(key).reset_index(drop=True)
    b = read_routed(ref_out).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])


def test_ruleset_hot_swap_keep_policy(multi_file_transcripts, tmp_path):
    """snapshot_manager.go:154-213 semantics: a new snapshot applies to
    SUBSEQUENT data only — with ruleset_policy="keep", partitions completed
    under the old snapshot are kept (their manifests retain the old
    fingerprint), later partitions run under the new one, and removal
    tombstones retire dropped mappings."""
    from sts_opentelemetry_collector_ray.rules.model import ComponentRule
    from sts_opentelemetry_collector_ray.state.manifest import ruleset_fingerprint

    out = str(tmp_path / "swap")
    rules_a = [
        ComponentRule(
            identifier="m-old", sink="s",
            identifier_expr="'u:' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'t'",
        ).compile()
    ]
    r1 = flagship_run(multi_file_transcripts, out, rules=rules_a,
                      num_partitions=2, max_partitions=1, enrich_concurrency=2)
    assert r1.partitions_skipped == 0
    rules_b = [
        ComponentRule(
            identifier="m-new", sink="s",
            identifier_expr="'v:' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'t'",
        ).compile()
    ]
    # default policy: changed ruleset invalidates the completed partition
    r_strict = flagship_run(multi_file_transcripts, out, rules=rules_b,
                            num_partitions=2, max_partitions=1, enrich_concurrency=2)
    assert r_strict.partitions_skipped == 0
    # rerun under A then hot-swap to B with keep: partition 0 (A) is kept
    flagship_run(multi_file_transcripts, out, rules=rules_a,
                 num_partitions=2, max_partitions=1, enrich_concurrency=2)
    r2 = flagship_run(multi_file_transcripts, out, rules=rules_b,
                      num_partitions=2, enrich_concurrency=2,
                      ruleset_policy="keep")
    assert r2.partitions_skipped == 1
    fps = sorted(
        json.load(open(p))["ruleset_fingerprint"]
        for p in glob.glob(os.path.join(out, "_manifests", "*.json"))
    )
    assert fps == sorted([ruleset_fingerprint(rules_a), ruleset_fingerprint(rules_b)])
    # dropped mapping m-old got removal tombstones
    tombs = glob.glob(os.path.join(out, "_tombstones", "*.parquet"))
    assert tombs
    tdf = pd.concat([pd.read_parquet(t) for t in tombs])
    assert "m-old" in set(tdf["data_source"])


def test_conv_clustered_input_makes_dedup_globally_exact(
    multi_file_transcripts, tmp_path
):
    """cluster_input_by_conv re-shards so no conversation straddles a partition;
    flagship's partition-scoped dedup then equals the globally-exact
    routed_dataset(dedup=True) row count."""
    import ray.data

    from sts_opentelemetry_collector_ray.pipelines.flagship import (
        cluster_input_by_conv,
        routed_dataset,
    )

    clustered = cluster_input_by_conv(
        multi_file_transcripts, str(tmp_path / "clustered"), num_partitions=3
    )
    out = str(tmp_path / "exact")
    r = flagship_run(clustered, out, num_partitions=3, enrich_concurrency=2)
    exact = routed_dataset(
        ray.data.read_parquet(
            sorted(glob.glob(os.path.join(multi_file_transcripts, "*.parquet")))
        ),
        dedup=True,
        enrich_concurrency=2,
    ).count()
    assert r.routed_rows == exact


def test_crashed_write_resumes_clean(multi_file_transcripts, tmp_path):
    """A partition that died mid-write (files on disk, NO manifest) must be
    fully rewritten on resume — on_write_start clears the partial directory, so
    no stale files leak into the routed output."""
    out = str(tmp_path / "crash")
    flagship_run(multi_file_transcripts, out, num_partitions=2, max_partitions=1,
                 enrich_concurrency=2)
    # simulate a crash in partition 1: partial garbage, no manifest
    part1 = os.path.join(out, "part-00001", "routed", "sink=logs_all")
    os.makedirs(part1, exist_ok=True)
    with open(os.path.join(part1, "part-99999-0000.parquet"), "wb") as f:
        f.write(b"not parquet")
    r = flagship_run(multi_file_transcripts, out, num_partitions=2,
                     enrich_concurrency=2)
    assert r.partitions_skipped == 1  # partition 0 untouched
    assert not os.path.exists(os.path.join(part1, "part-99999-0000.parquet"))
    # the whole output is readable parquet
    df = read_routed(out)
    assert len(df) == r.routed_rows


def test_torn_manifest_reprocessed(multi_file_transcripts, tmp_path):
    """A corrupted (torn-write) manifest must cause reprocessing, not a crash."""
    out = str(tmp_path / "torn")
    flagship_run(multi_file_transcripts, out, num_partitions=2, enrich_concurrency=2)
    mpath = glob.glob(os.path.join(out, "_manifests", "*.json"))[0]
    with open(mpath, "w") as f:
        f.write('{"pid": 0, "truncated')  # torn write
    r = flagship_run(multi_file_transcripts, out, num_partitions=2, enrich_concurrency=2)
    assert r.partitions_skipped == 1  # only the intact manifest skips
    assert json.load(open(mpath))["routed_rows"] > 0  # rewritten whole


def test_pathological_hot_conversation_skew(tmp_path):
    """A single conversation holding 60% of the corpus (the 10⁶-turn agent-loop
    scenario): the salted flagship completes, matches the unsalted row set
    exactly, and the hot conversation's rows actually SPREAD across buckets
    (visible as multiple routed output files containing the hot conv)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as _pq

    import ray.data
    from sts_opentelemetry_collector_ray.pipelines.flagship import routed_dataset
    from sts_opentelemetry_collector_ray.stages.dedup import finalize_routed

    n_hot, n_cold = 12_000, 8_000
    rows = {
        "conv_id": ["conv-hot"] * n_hot + [f"conv-{i % 97:04d}" for i in range(n_cold)],
        "turn_idx": pa.array(
            list(range(n_hot)) + [i // 97 for i in range(n_cold)], pa.int32()
        ),
        "role": ["user"] * (n_hot + n_cold),
        "text": [f"[INFO] m k={i}" for i in range(n_hot + n_cold)],
        "tool": [""] * (n_hot + n_cold),
        "ts": pa.nulls(n_hot + n_cold, pa.timestamp("us")),
    }
    src = str(tmp_path / "skew.parquet")
    _pq.write_table(pa.table(rows), src)

    plain = routed_dataset(
        ray.data.read_parquet(src), dedup=True, enrich_concurrency=2
    ).to_pandas()
    salted = routed_dataset(
        ray.data.read_parquet(src), dedup=True, enrich_concurrency=2, salt_span=1000
    ).to_pandas()
    key = ["sink", "data_source", "conv_id", "turn_idx"]
    a = plain[key].sort_values(key).reset_index(drop=True)
    b = salted[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_finalize_preserves_dedup_and_counts(multi_file_transcripts):
    """Opt-in hot-conversation salting: identical surviving row set (salting only
    re-buckets turn-unique rows, which cannot have cross-chunk duplicates)."""
    import ray.data

    from sts_opentelemetry_collector_ray.pipelines.flagship import routed_dataset
    from sts_opentelemetry_collector_ray.rules.model import default_ruleset
    from sts_opentelemetry_collector_ray.stages.dedup import finalize_routed
    from sts_opentelemetry_collector_ray.stages.enrich import enrich_stage
    from sts_opentelemetry_collector_ray.stages.parse import parse_stage
    from sts_opentelemetry_collector_ray.stages.route import route_stage

    ds = ray.data.read_parquet(sorted(glob.glob(f"{multi_file_transcripts}/*.parquet")))
    routed = route_stage(enrich_stage(parse_stage(ds), concurrency=2))
    plain = finalize_routed(routed).to_pandas()
    ds2 = ray.data.read_parquet(sorted(glob.glob(f"{multi_file_transcripts}/*.parquet")))
    routed2 = route_stage(enrich_stage(parse_stage(ds2), concurrency=2))
    salted = finalize_routed(routed2, salt_span=8).to_pandas()
    key = ["sink", "data_source", "conv_id", "turn_idx", "action"]
    a = plain[key].sort_values(key).reset_index(drop=True)
    b = salted[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_flagship_shard_keyed_layout(multi_file_transcripts, tmp_path):
    """K1 exact keyed layout: out/<sink>/shard_id=<k>/ directories."""
    out = str(tmp_path / "keyed")
    flagship_run(
        multi_file_transcripts, out, num_partitions=1, enrich_concurrency=2,
        output_partition_cols=["sink", "shard_id"],
    )
    shard_dirs = glob.glob(os.path.join(out, "part-00000", "routed", "sink=*", "shard_id=*"))
    assert shard_dirs
    shards = {d.split("shard_id=")[1] for d in shard_dirs}
    assert shards <= {"0", "1", "2", "3", "unknown"}
    assert "unknown" in shards  # error rows keep their own shard dir


def test_ruleset_change_emits_tombstones(multi_file_transcripts, tmp_path):
    """Settings-snapshot swap: a removed mapping fans REMOVE tombstones to all
    shards on the next run (snapshot_manager.go:154-213 / message_builder.go:85-110)."""
    from sts_opentelemetry_collector_ray.rules.model import default_ruleset

    out = str(tmp_path / "swap")
    flagship_run(multi_file_transcripts, out, num_partitions=1, enrich_concurrency=2)
    assert not glob.glob(os.path.join(out, "_tombstones", "*.parquet"))  # first run: none
    smaller = [r for r in default_ruleset() if r.rule.identifier != "urn:mapping:error-turns"]
    flagship_run(multi_file_transcripts, out, rules=smaller, num_partitions=1, enrich_concurrency=2)
    tfiles = glob.glob(os.path.join(out, "_tombstones", "*.parquet"))
    assert len(tfiles) == 1
    tomb = pq.read_table(tfiles[0]).to_pandas()
    assert set(tomb["data_source"]) == {"urn:mapping:error-turns"}
    assert sorted(tomb["shard_id"]) == ["0", "1", "2", "3"]
    # identical ruleset on a third run: no new tombstones
    flagship_run(multi_file_transcripts, out, rules=smaller, num_partitions=1, enrich_concurrency=2)
    assert len(glob.glob(os.path.join(out, "_tombstones", "*.parquet"))) == 1


def test_run_twice_byte_identical_routed_sets(multi_file_transcripts, tmp_path):
    """Determinism (SURVEY §5): two independent runs produce identical routed
    content — every column, both runs, full-frame equality under canonical sort."""
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (a_dir, b_dir):
        flagship_run(multi_file_transcripts, d, num_partitions=2, enrich_concurrency=2)
    key = ["sink", "data_source", "conv_id", "turn_idx", "action"]
    a = read_routed(a_dir).sort_values(key).reset_index(drop=True)
    b = read_routed(b_dir).sort_values(key).reset_index(drop=True)
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b)


def test_changed_input_invalidates_only_that_partition(multi_file_transcripts, tmp_path):
    """Lineage correctness: editing ONE input file re-runs ONLY the partition
    whose input_fingerprint changed; the others resume from their manifests,
    and the rerun output equals a from-scratch run over the edited corpus."""
    import shutil

    corpus = str(tmp_path / "corpus")
    shutil.copytree(multi_file_transcripts, corpus)
    out = str(tmp_path / "out")
    r1 = flagship_run(corpus, out, num_partitions=3, enrich_concurrency=2)
    assert r1.partitions_total == 3 and r1.partitions_skipped == 0

    # touch one file: rewrite it with one row dropped (content + size change)
    victim = sorted(glob.glob(os.path.join(corpus, "*.parquet")))[0]
    import pyarrow.parquet as pq

    t = pq.read_table(victim)
    pq.write_table(t.slice(1), victim)

    r2 = flagship_run(corpus, out, num_partitions=3, enrich_concurrency=2)
    assert r2.partitions_skipped == 2  # only the edited file's partition re-ran

    ref = str(tmp_path / "ref")
    flagship_run(corpus, ref, num_partitions=3, enrich_concurrency=2)
    key = ["sink", "data_source", "conv_id", "turn_idx", "action"]
    a = read_routed(out).sort_values(key).reset_index(drop=True)
    b = read_routed(ref).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])
