"""Tests for export-side operators (K5/K6/A7/O4 analogues), envelope packing (A5)
and ruleset diff tombstones (D2)."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from sts_opentelemetry_collector_ray import ENVELOPE_MAX_BYTES, SHARD_COUNT
from sts_opentelemetry_collector_ray.functions import fnv1a32
from sts_opentelemetry_collector_ray.rules.diff import ruleset_diff, ruleset_identifiers
from sts_opentelemetry_collector_ray.rules.model import ComponentRule, default_ruleset
from sts_opentelemetry_collector_ray.stages.export import (
    hash_sample,
    resource_dedup,
    topology_collections,
    usage_bytes,
)
from sts_opentelemetry_collector_ray.stages.pack import _pack_group, pack_envelopes


def routed_frame():
    return pd.DataFrame(
        {
            "sink": ["logs_all"] * 4 + ["topology_relations"] * 2,
            "data_source": ["m1"] * 4 + ["mrel"] * 2,
            "shard_id": ["0", "1", "0", "1", "2", "2"],
            "external_id": ["u:b", "u:a", "u:c", "u:a", "r:x-y", "r:y-z"],
            "source_id": [None, None, None, None, "x", "y"],
            "conv_id": ["c1", "c1", "c2", "c2", "c1", "c2"],
            "turn_idx": np.array([0, 1, 0, 1, 2, 3], dtype=np.int32),
            "role": ["user"] * 6,
            "tool": [""] * 6,
            "name": ["n"] * 6,
            "type_name": ["t"] * 6,
            "tags": [None] * 6,
            "text": ["hello world"] * 6,
            "error": [None] * 6,
            "action": ["CREATE"] * 6,
        }
    )


def test_topology_collections_sorted_deterministic():
    ds = ray.data.from_pandas(routed_frame())
    out = topology_collections(ds, key_col="role").to_pandas()
    assert len(out) == 1
    payload = json.loads(out["payload"].iloc[0])
    # components & relations sorted by external id before emit (topology.go:335-355)
    assert payload["components"] == sorted(payload["components"])
    assert payload["relations"] == ["r:x-y", "r:y-z"]
    assert out["n_components"].iloc[0] == 3  # u:a deduped across rows


def test_resource_dedup():
    df = pd.DataFrame(
        {"role": ["user", "user", "tool"], "tool": ["", "", "bash"]}
    )
    out = resource_dedup(ray.data.from_pandas(df), ["role", "tool"]).to_pandas()
    assert len(out) == 2
    assert set(out.columns) == {"role", "tool", "resource_ref"}


def test_usage_bytes():
    ds = ray.data.from_pandas(routed_frame())
    out = usage_bytes(ds).to_pandas().set_index("sink")["total_bytes"]
    assert out["logs_all"] == 4 * len("hello world")


def test_hash_sample_deterministic():
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(1000)],
            "turn_idx": np.arange(1000, dtype=np.int32),
        }
    )
    out = hash_sample(ray.data.from_pandas(df), pct=10).to_pandas()
    # matches the scalar definition exactly
    exp = [
        (c, t)
        for c, t in zip(df["conv_id"], df["turn_idx"])
        if fnv1a32(f"{c}:{t}") % 100 < 10
    ]
    assert set(zip(out["conv_id"], out["turn_idx"])) == set(exp)
    assert 50 < len(out) < 150  # ~10%


def test_pack_byte_cap_and_order():
    g = routed_frame()
    g = pd.concat([g] * 200, ignore_index=True)  # make it big enough to split
    g = g[g["data_source"] == "m1"].copy()
    g["shard_id"] = "0"
    out = _pack_group(4096)(g)
    assert (out["bytes"] <= 4096).all()
    assert out["envelope_idx"].tolist() == list(range(len(out)))
    assert out["n_rows"].sum() == len(g)
    # first-seen order: first envelope starts at the smallest (conv, turn)
    assert out.iloc[0]["first_conv"] == "c1" and out.iloc[0]["first_turn"] == 0


def test_pack_envelopes_ray():
    ds = ray.data.from_pandas(routed_frame())
    out = pack_envelopes(ds).to_pandas()
    assert out["n_rows"].sum() == 6
    assert (out["bytes"] <= ENVELOPE_MAX_BYTES).all()
    # grouped by (data_source, shard_id)
    assert len(out) == len(out.drop_duplicates(["data_source", "shard_id", "envelope_idx"]))


def test_ruleset_diff_tombstones():
    old = default_ruleset()
    new = [r for r in old if r.rule.identifier != "urn:mapping:error-turns"]
    removed, added, tomb = ruleset_diff(old, new)
    assert removed == ["urn:mapping:error-turns"] and added == []
    assert tomb.num_rows == SHARD_COUNT  # one Remove per shard (message_builder.go:85-110)
    assert set(tomb["shard_id"].to_pylist()) == {"0", "1", "2", "3"}
    assert set(tomb["action"].to_pylist()) == {"REMOVE"}
    # changed rule == removed + added (serialized comparison)
    changed = [
        ComponentRule(
            identifier="urn:mapping:all-turns",
            sink="other_sink",
            identifier_expr="'x'",
            type_name_expr="'t'",
        ).compile()
    ] + [r for r in old if r.rule.identifier != "urn:mapping:all-turns"]
    removed2, added2, _ = ruleset_diff(old, changed)
    assert "urn:mapping:all-turns" in removed2 and "urn:mapping:all-turns" in added2
    # identity diff is empty
    r3, a3, t3 = ruleset_diff(old, old)
    assert r3 == [] and a3 == [] and t3.num_rows == 0


def test_pack_skewed_data_source_bounded_buckets():
    """One fat data_source spanning many conv buckets: packing runs per bounded
    sub-bucket, envelopes never span a bucket boundary, and the prefix-sum
    renumbering yields one dense envelope_idx sequence per (ds, shard)."""
    from sts_opentelemetry_collector_ray.stages.pack import CONVS_PER_BUCKET

    n_convs, per_conv = 4 * CONVS_PER_BUCKET, 3  # 4 buckets, one hot source
    conv = np.repeat(np.arange(n_convs), per_conv)
    df = pd.DataFrame(
        {
            "data_source": "hot",
            "shard_id": "0",
            "external_id": [f"u:{c}:{t}" for c, t in zip(conv, range(len(conv)))],
            "conv_id": [f"conv-{c:08d}" for c in conv],
            "turn_idx": np.tile(np.arange(per_conv, dtype=np.int32), n_convs),
            "name": "n",
            "type_name": "t",
            "tags": None,
            "text": "x" * 200,
            "action": "CREATE",
        }
    )
    cap = 4096
    out = (
        pack_envelopes(ray.data.from_pandas(df), max_bytes=cap)
        .to_pandas()
        .sort_values("envelope_idx")
        .reset_index(drop=True)
    )
    assert out["n_rows"].sum() == len(df)
    assert (out["bytes"] <= cap).all()
    # dense global numbering per (ds, shard)
    assert out["envelope_idx"].tolist() == list(range(len(out)))
    # envelopes never span a conv-bucket boundary: each envelope's rows fit in
    # one bucket, so first_conv buckets are non-decreasing and all 4 appear
    b = out["first_conv"].str[5:].astype(int) // CONVS_PER_BUCKET
    assert (np.diff(b) >= 0).all() and set(b) == {0, 1, 2, 3}
    # the boundary reset really happened: the first envelope of each bucket
    # starts at that bucket's first conversation
    firsts = out.loc[b.drop_duplicates().index, "first_conv"].tolist()
    assert firsts == [f"conv-{k * CONVS_PER_BUCKET:08d}" for k in range(4)]


def test_pack_removes_pass_through_uncoalesced():
    # DELETE rows are never merged into envelopes (grouping_test.go invariant)
    g = routed_frame()
    g = g[g["data_source"] == "m1"].copy()
    g["shard_id"] = "0"
    g.loc[g.index[1], "action"] = "DELETE"
    g["action"] = g.get("action", "CREATE")
    g["action"] = g["action"].fillna("CREATE")
    out = _pack_group(10**6)(g)
    # one big CREATE envelope cannot contain the DELETE: at least 2 envelopes,
    # one of which is a single-row envelope
    assert (out["n_rows"] == 1).any()
    assert out["n_rows"].sum() == len(g)


def test_pack_documents_token_budget(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.pack import pack_documents

    # sizes 3,3,3,10,4,4 with cap 10 → bins [3,3,3][10][4,4]; doc 3 alone,
    # oversize-equal-to-cap ships; order is doc_id even across input shuffle
    texts = ["a b c", "d e f", "g h i", " ".join(["w"] * 10), "x y z q", "r s t u"]
    ids = [0, 1, 2, 3, 4, 5]
    perm = [3, 0, 5, 2, 4, 1]  # shuffled input
    t = pa.table({"doc_id": pa.array([ids[i] for i in perm], pa.int64()),
                  "text": [texts[i] for i in perm]})
    out = (
        pack_documents(ray.data.from_arrow(t), max_tokens=10)
        .to_pandas().sort_values("bin_idx").reset_index(drop=True)
    )
    assert out["bin_idx"].tolist() == [0, 1, 2]
    assert out["n_docs"].tolist() == [3, 1, 2]
    assert out["n_tokens"].tolist() == [9, 10, 8]
    assert out["first_doc"].tolist() == [0, 3, 4]


def test_pack_documents_global_renumber_across_buckets(ray_session):
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.pack import pack_documents

    # two buckets (docs_per_bucket=2): bins renumber densely bucket by bucket
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": ["a b", "c d", "e f", "g h"]})
    out = (
        pack_documents(ray.data.from_arrow(t), max_tokens=2, docs_per_bucket=2)
        .to_pandas().sort_values("bin_idx").reset_index(drop=True)
    )
    assert out["bin_idx"].tolist() == [0, 1, 2, 3]
    assert out["first_doc"].tolist() == [0, 1, 2, 3]
