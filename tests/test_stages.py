"""Stage-level tests on tiny Arrow tables (SURVEY.md §5 translation: table-driven unit
tests per operator — parse, enrich, route incl. regex tags / DELETE / error rows,
dedup, aggregate)."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sts_opentelemetry_collector_ray.functions import fnv1a32
from sts_opentelemetry_collector_ray.rules.model import (
    ComponentRule,
    RegexTagMapping,
    RelationRule,
    default_ruleset,
)
from sts_opentelemetry_collector_ray.stages.enrich import EnrichActor
from sts_opentelemetry_collector_ray.stages.parse import parse_batch
from sts_opentelemetry_collector_ray.stages.route import Router


def turns_table(rows):
    cols = {
        "conv_id": [r.get("conv_id", "c0") for r in rows],
        "turn_idx": pa.array([r.get("turn_idx", i) for i, r in enumerate(rows)], pa.int32()),
        "role": [r.get("role", "user") for r in rows],
        "text": [r.get("text", "") for r in rows],
        "tool": [r.get("tool", "") for r in rows],
        "ts": pa.array([r.get("ts") for r in rows], pa.timestamp("us")),
    }
    return pa.table(cols)


def test_parse_severity_and_sig():
    t = turns_table(
        [
            {"text": "[ERROR] boom k=7 call:bash(q7)"},
            {"text": "session start k=1"},
            {"text": "[WARN] view k=2 attr.env=prod attr.zone=z1"},
        ]
    )
    p = parse_batch(t)
    assert p["severity"].to_pylist() == ["ERROR", "UNKNOWN", "WARN"]
    assert p["tool_sig"].to_pylist() == ["call:bash(q7)", None, None]
    assert p["tool_name"].to_pylist() == ["bash", None, None]
    attrs = p["attrs"].to_pylist()
    assert attrs[0] is None
    assert dict(attrs[2]) == {"attr.env": "prod", "attr.zone": "z1"}
    # null ts coalesced to the fixed processing instant (signal_traverser.go:111-119)
    assert p["ts_eff"].to_pylist()[0] is not None


def test_enrich_lookups():
    t = turns_table([{"tool": "bash", "role": "tool"}, {"tool": "", "role": "user"}])
    out = EnrichActor()(t)
    assert out["tool_category"].to_pylist() == ["exec", "none"]
    assert out["owner_team"].to_pylist() == ["team-infra", "none"]
    assert out["role_class"].to_pylist() == ["machine", "human"]


def _routed(rows, rules):
    batch = EnrichActor()(parse_batch(turns_table(rows)))
    return Router(rules=rules)(batch)


def test_route_condition_and_shard():
    rules = [
        ComponentRule(
            identifier="m1",
            sink="s1",
            condition="severity == 'ERROR'",
            identifier_expr="'urn:' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'t'",
        ).compile()
    ]
    out = _routed(
        [
            {"text": "[ERROR] x", "conv_id": "c1", "turn_idx": 0},
            {"text": "[INFO] y", "conv_id": "c1", "turn_idx": 1},
        ],
        rules,
    )
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["external_id"] == "urn:c1/0"
    assert row["shard_id"] == str(fnv1a32("urn:c1/0") % 4)
    assert row["action"] == "CREATE"
    assert row["error"] is None


def test_route_error_rows_required_vs_optional():
    # required identifier fails ⇒ error row with shard 'unknown' (message_builder.go:66-70);
    # optional name fails ⇒ null, no error (mapping.go:348-359)
    rules = [
        ComponentRule(
            identifier="m-bad",
            sink="s",
            identifier_expr="'u:' + nonexistent_col",
            type_name_expr="'t'",
        ).compile(),
        ComponentRule(
            identifier="m-optional",
            sink="s",
            identifier_expr="'u:' + conv_id",
            name_expr="'n:' + nonexistent_col",
            type_name_expr="'t'",
        ).compile(),
    ]
    out = _routed([{"text": "[INFO] x"}], rules).to_pylist()
    bad = [r for r in out if r["data_source"] == "m-bad"][0]
    assert bad["shard_id"] == "unknown" and bad["error"] is not None
    assert bad["external_id"] is None and bad["dedup_key"] is None
    opt = [r for r in out if r["data_source"] == "m-optional"][0]
    assert opt["error"] is None and opt["name"] is None
    assert opt["external_id"] == "u:c0"


def test_route_delete_action():
    rules = [
        ComponentRule(
            identifier="m-del",
            sink="s",
            condition="severity == 'UNKNOWN'",
            action="DELETE",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
        ).compile()
    ]
    out = _routed([{"text": "no tokens"}, {"text": "[INFO] x"}], rules).to_pylist()
    assert len(out) == 1
    assert out[0]["action"] == "DELETE"
    assert out[0]["dedup_key"] is None  # DELETE is not dedup-gated


def test_route_component_field_outputs():
    """mapping.go:65-150: identifiers order (identifier, optional, required),
    required-wins-over-optional for configuration, non-map any-value ⇒ null
    Struct (toStructValue), optional failure lenient, required failure strict."""
    rules = [
        ComponentRule(
            identifier="m-fields",
            sink="s",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
            additional_identifiers=["'req:' + conv_id"],
            optional_additional_identifiers=["'opt:' + role", "'x' + missing_col"],
            required_configuration="pick(attrs, ['attr.env'])",
            optional_configuration="omit(attrs, [])",
            optional_status="'not-a-map'",  # non-map ⇒ null (toStructValue nil)
            optional_version="'v2.' + role",
        ).compile()
    ]
    out = _routed(
        [{"text": "[INFO] x attr.env=prod attr.zone=z1", "conv_id": "c9", "role": "user"}],
        rules,
    ).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert r["error"] is None
    assert r["identifiers"] == '["u:c9","opt:user","req:c9"]'
    assert r["configuration"] == '{"attr.env":"prod"}'  # required wins
    assert r["status"] is None
    assert r["version"] == "v2.user"
    assert r["expire_after_ms"] == 900_000 and r["specificity"] == 100.0


def test_route_required_additional_identifier_failure_is_strict():
    rules = [
        ComponentRule(
            identifier="m-strict",
            sink="s",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
            additional_identifiers=["'x' + missing_col"],
        ).compile()
    ]
    out = _routed([{"text": "[INFO] x"}], rules).to_pylist()
    assert len(out) == 1
    assert out[0]["error"] is not None and out[0]["shard_id"] == "unknown"
    assert out[0]["identifiers"] is None


def test_route_per_level_condition_tree():
    """visitor.go:36-107 / model.gen.go:926-1070: the resource-level condition
    prunes the subtree before the leaf condition runs; a resource-condition
    error ⇒ false prunes even rows whose leaf condition is true."""
    rules = [
        ComponentRule(
            identifier="m-tree",
            sink="s",
            resource_condition="severity == 'ERROR'",
            condition="tool != ''",
            identifier_expr="'u:' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'t'",
        ).compile()
    ]
    out = _routed(
        [
            {"text": "[ERROR] x", "tool": "bash", "turn_idx": 0},  # both pass
            {"text": "[ERROR] y", "tool": "", "turn_idx": 1},  # leaf fails
            {"text": "[INFO] z", "tool": "bash", "turn_idx": 2},  # resource prunes
        ],
        rules,
    ).to_pylist()
    assert [r["turn_idx"] for r in out] == [0]
    # resource condition eval error => false => subtree pruned (no error row)
    rules_err = [
        ComponentRule(
            identifier="m-tree-err",
            sink="s",
            resource_condition="missing_col == 'x'",
            condition="tool != ''",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
        ).compile()
    ]
    out2 = _routed([{"text": "[ERROR] x", "tool": "bash"}], rules_err)
    assert out2.num_rows == 0


def test_topology_add_resource_reference_semantics():
    """topology.go:29-200 paths the driver data can't reach: pod secondary URN,
    faas fallback when host.id absent, scope/environment tags, k8s relation."""
    from sts_opentelemetry_collector_ray.stages.topology import add_resource

    rows = add_resource(
        {
            "service.name": "svc",
            "service.namespace": "prod",
            "service.instance.id": "i1",
            "service.version": "2.0",
            "deployment.environment": "staging",
            "faas.id": "fn-7",
            "faas.version": "9",
            "k8s.cluster.name": "cl",
            "k8s.namespace.name": "ns",
            "k8s.pod.name": "pod-1",
            "telemetry.sdk.name": "otel",
        }
    )
    by_id = {(r["kind"], r["external_id"]): r for r in rows}
    svc = by_id[("component", "urn:opentelemetry:namespace/prod:service/svc")]
    assert svc["version"] == "2.0" and svc["environment"] == "staging"
    assert '"telemetry.sdk.name":"otel"' in svc["tags"]
    assert '"cluster-name":"cl"' in svc["tags"] and '"k8s-scope":"cl/ns"' in svc["tags"]
    inst = by_id[
        ("component", "urn:opentelemetry:namespace/prod:service/svc:serviceInstance/i1")
    ]
    assert inst["name"] == "svc - i1"
    fn = by_id[("component", "urn:opentelemetry:function/fn-7")]
    assert fn["version"] == "9" and '"faas.id":"fn-7"' in fn["tags"]
    pod = by_id[("component", "urn:opentelemetry:kubernetes:/cl:ns:pod/pod-1")]
    assert pod["identifiers"] == '["urn:kubernetes:/cl:ns:pod/pod-1"]'
    rel_types = sorted(
        r["type_name"] for r in rows if r["kind"] == "relation"
    )
    assert rel_types == ["executes", "kubernetes-to-otel", "provided-by"]
    # host.id beats faas.id (first match wins)
    rows2 = add_resource({"service.name": "s", "host.id": "h1", "faas.id": "f1"})
    kinds = {r["type_name"] for r in rows2 if r["kind"] == "component"}
    assert "host" in kinds and "function" not in kinds
    # no service.name -> nothing (AddResource false path)
    assert add_resource({"host.id": "h"}) == []


def test_topology_add_connection_reference_semantics():
    """topology.go:203-319: peer redirection, async consumer relation, missing
    required attr ⇒ skip, unknown connection_type ⇒ skip, instance-id fallback."""
    from sts_opentelemetry_collector_ray.stages.topology import add_connection

    base = {"client": "web", "client_service.namespace": "p", "server": "db1"}
    # database without peer: component + relation
    rows = add_connection({**base, "connection_type": "database"})
    comp = [r for r in rows if r["kind"] == "component"][0]
    rel = [r for r in rows if r["kind"] == "relation"][0]
    assert comp["external_id"] == "urn:opentelemetry:namespace/p:service/web:database/db1"
    assert comp["type_name"] == "database"
    assert rel["source_id"].endswith(":serviceInstance/web")  # instance fallback
    assert rel["target_id"] == comp["external_id"] and rel["type_name"] == "database"
    # database WITH peer: no component, target is the peer service
    rows = add_connection(
        {**base, "connection_type": "database", "client_peer.service": "pg"}
    )
    assert all(r["kind"] == "relation" for r in rows)
    assert rows[0]["target_id"] == "urn:opentelemetry:namespace/p:service/pg"
    # async with peer: consumer->peer AND producer->peer
    rows = add_connection(
        {**base, "connection_type": "messaging_system",
         "server_service.namespace": "q", "client_peer.service": "topic"}
    )
    targets = {r["target_id"] for r in rows}
    assert targets == {"urn:opentelemetry:namespace/p:service/topic"}
    sources = {r["source_id"] for r in rows}
    assert "urn:opentelemetry:namespace/q:service/db1:serviceInstance/db1" in sources
    # async without server namespace: skip
    assert add_connection({**base, "connection_type": "messaging_system"}) == []
    # sync with explicit instance ids
    rows = add_connection(
        {**base, "connection_type": "", "server_service.namespace": "q",
         "client_service.instance.id": "i9", "server_service.instance.id": "j7"}
    )
    assert rows[0]["source_id"].endswith(":serviceInstance/i9")
    assert rows[0]["target_id"].endswith(":serviceInstance/j7")
    assert rows[0]["type_name"] == "synchronous"
    # unknown type / missing required attr: skip
    assert add_connection({**base, "connection_type": "bogus"}) == []
    assert add_connection({"client": "x", "connection_type": ""}) == []


def test_route_computed_action_expression():
    """action as a CEL-lite string expression (mapping_handler.go:103-121):
    per-element CREATE/DELETE branch, unknown value ⇒ silent skip."""
    rules = [
        ComponentRule(
            identifier="m-watch",
            sink="s",
            action="'DELETE' if severity == 'UNKNOWN' else "
            "('SKIPME' if severity == 'WARN' else 'CREATE')",
            identifier_expr="'u:' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'t'",
        ).compile()
    ]
    out = _routed(
        [
            {"text": "no tokens", "turn_idx": 0},  # UNKNOWN -> DELETE
            {"text": "[INFO] x", "turn_idx": 1},  # -> CREATE
            {"text": "[WARN] y", "turn_idx": 2},  # unknown action value -> skip
        ],
        rules,
    ).to_pylist()
    acts = {r["turn_idx"]: r["action"] for r in out}
    assert acts == {0: "DELETE", 1: "CREATE"}
    by_idx = {r["turn_idx"]: r for r in out}
    assert by_idx[0]["dedup_key"] is None  # DELETE not dedup-gated
    assert by_idx[1]["dedup_key"] is not None
    assert all(r["error"] is None for r in out)


def test_route_computed_action_eval_error_skips_silently():
    # eval error in the action expression ⇒ element skipped, NO error row
    # (mapping_handler.go:55-58) — unlike required-projection failures.
    rules = [
        ComponentRule(
            identifier="m-err",
            sink="s",
            action="'CREATE' if missing_column == 'x' else 'DELETE'",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
        ).compile()
    ]
    out = _routed([{"text": "[INFO] x"}], rules)
    assert out.num_rows == 0


def test_route_computed_delete_ignored_for_non_logs_signal():
    # DELETE is terminal-valid only for LOGS; METRICS silently drops it
    # (mapping_handler.go:72-99).
    def mk(signal):
        return ComponentRule(
            identifier=f"m-{signal}",
            signal=signal,
            sink="s",
            action="'DELETE'",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
        ).compile()

    logs = _routed([{"text": "[INFO] x"}], [mk("LOGS")])
    metrics = _routed([{"text": "[INFO] x"}], [mk("METRICS")])
    assert logs.num_rows == 1 and logs.to_pylist()[0]["action"] == "DELETE"
    assert metrics.num_rows == 0


def test_route_regex_tags():
    rules = [
        ComponentRule(
            identifier="m-tags",
            sink="s",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
            regex_tags=[
                RegexTagMapping(source="attrs", pattern=r"^attr\.(.+)$", target="t.${1}")
            ],
        ).compile()
    ]
    out = _routed([{"text": "[INFO] x attr.env=prod attr.zone=z2"}], rules).to_pylist()
    tags = json.loads(out[0]["tags"])
    assert tags == {"t.env": "prod", "t.zone": "z2"}


def test_route_relation_rule():
    rules = [
        RelationRule(
            identifier="m-rel",
            sink="rel",
            condition="tool != ''",
            source_id_expr="'urn:conv/' + conv_id",
            target_id_expr="'urn:tool/' + tool",
            type_name_expr="'uses'",
            dependency_type_expr="' connection '",  # normalize (mapping.go:280-292)
        ).compile()
    ]
    out = _routed([{"text": "[INFO] x", "tool": "bash"}], rules).to_pylist()
    r = out[0]
    assert r["source_id"] == "urn:conv/c0"
    assert r["target_id"] == "urn:tool/bash"
    assert r["external_id"] == "urn:conv/c0-urn:tool/bash"
    assert r["dependency_type"] == "CONNECTION"


def test_route_fanout_multiplication():
    # one turn matching 2+ rules fans out to multiple routed rows
    out = _routed([{"text": "[ERROR] x", "role": "tool", "tool": "bash"}], default_ruleset())
    sinks = sorted(set(out["sink"].to_pylist()))
    assert "logs_all" in sinks and "logs_errors" in sinks and "metrics_tools" in sinks
    assert "topology_relations" in sinks


def test_dedup_key_projection_insensitive_to_unreferenced_cols():
    # dedup key covers ONLY referenced fields (deduplicator_test.go:17-245 analogue):
    # changing `text` (unreferenced) must not change the key; changing severity must.
    rule = ComponentRule(
        identifier="m-dd",
        sink="s",
        condition="severity == 'ERROR'",
        identifier_expr="'u:' + severity",
        type_name_expr="'t'",
    ).compile()
    a = _routed([{"text": "[ERROR] one", "conv_id": "cX"}], [rule]).to_pylist()[0]
    b = _routed([{"text": "[ERROR] two totally different", "conv_id": "cX"}], [rule]).to_pylist()[0]
    assert a["dedup_key"] == b["dedup_key"]
    assert rule.referenced_columns == {"severity"}


def test_sensitive_attrs_stripped():
    # model.go:23-28 — routing keys deleted before any rule can see them
    t = turns_table([{"text": "[INFO] x attr.sts_api_key=secret attr.env=prod"}])
    attrs = dict(parse_batch(t)["attrs"].to_pylist()[0])
    assert attrs == {"attr.env": "prod"}


def test_load_ruleset_from_json_file(tmp_path):
    # S4 file settings provider analogue: rules as data, loaded from disk
    import json as _json

    from sts_opentelemetry_collector_ray.rules.model import load_ruleset

    spec = [
        {
            "identifier": "urn:mapping:file-rule",
            "sink": "s1",
            "condition": "severity == 'ERROR'",
            "identifier_expr": "'u:' + conv_id",
            "type_name_expr": "'t'",
            "regex_tags": [
                {"source": "attrs", "pattern": "^attr\\.(.+)$", "target": "t.${1}"}
            ],
        },
        {
            "kind": "relation",
            "identifier": "urn:mapping:file-rel",
            "sink": "rels",
            "source_id_expr": "'a:' + conv_id",
            "target_id_expr": "'b:' + tool",
            "type_name_expr": "'uses'",
        },
    ]
    p = tmp_path / "rules.json"
    p.write_text(_json.dumps(spec))
    rules = load_ruleset(str(p))
    assert len(rules) == 2 and rules[1].is_relation
    out = _routed([{"text": "[ERROR] x", "tool": "bash"}], rules).to_pylist()
    assert {r["data_source"] for r in out} == {"urn:mapping:file-rule", "urn:mapping:file-rel"}


def test_unicode_text_through_routing():
    # multibyte text must survive parse → route → shard/dedup hashing unharmed
    rows = [
        {"text": "[ERROR] ошибка 🚨 call:bash(q1) attr.env=продакшн", "tool": "bash", "role": "tool"},
        {"text": "[INFO] 日本語のログ k=42", "role": "user"},
        {"text": "héllo wörld — no tokens"},
    ]
    out = _routed(rows, default_ruleset())
    assert out.num_rows > 0
    sevs = {r["severity"] for r in out.to_pylist()}
    assert {"ERROR", "INFO", "UNKNOWN"} <= sevs
    # texts round-trip byte-identically on the carrying sink
    all_turns = [r for r in out.to_pylist() if r["data_source"] == "urn:mapping:all-turns"]
    assert sorted(r["text"] for r in all_turns) == sorted(r["text"] for r in rows)
    # shard ids stay in range; dedup keys present for CREATE rows
    assert all(r["shard_id"] in {"0", "1", "2", "3", "unknown"} for r in out.to_pylist())
    # regex tags with non-ASCII values serialize to valid JSON
    diag = [r for r in out.to_pylist() if r["data_source"] == "urn:mapping:diag-turns"]
    for r in diag:
        if r["tags"]:
            json.loads(r["tags"])


def test_canonical_projection_semantics():
    """deduplicator_test.go:17-245 analogue: attr-map KEY order must not change the
    dedup key; list VALUE order must; equal values of different types must."""
    import numpy as np

    from sts_opentelemetry_collector_ray.stages.route import _canonical_projection

    def canon(env):
        return _canonical_projection(
            {k: np.array(v, dtype=object) for k, v in env.items()},
            sorted(env.keys()),
            1,
        ).to_pylist()[0]

    # map key order insensitive (canonical JSON sorts keys)
    a = canon({"attrs": [{"x": "1", "y": "2"}]})
    b = canon({"attrs": [{"y": "2", "x": "1"}]})
    assert a == b
    # list order sensitive
    assert canon({"v": [["a", "b"]]}) != canon({"v": [["b", "a"]]})
    # type tags distinguish equal-looking values
    assert canon({"v": [1]}) != canon({"v": ["1"]})
    assert canon({"v": [True]}) != canon({"v": [1]})
    # float encoding via IEEE bits: 1.0 (float) != 1 (int)
    assert canon({"v": [1.0]}) != canon({"v": [1]})
    # None distinct from empty string
    assert canon({"v": [None]}) != canon({"v": [""]})


def test_route_required_version_nonstring_stringifies():
    """A required-version expression yielding a non-string (e.g. an int column)
    must stringify like the optional path / toString — not crash the batch UDF
    at pa.array(..., pa.string()) (round-3 ADVICE fix)."""
    rules = [
        ComponentRule(
            identifier="m-ver",
            sink="s",
            identifier_expr="'u:' + conv_id",
            type_name_expr="'t'",
            required_version="turn_idx",
        ).compile()
    ]
    out = _routed([{"text": "[INFO] x", "turn_idx": 7}], rules).to_pylist()
    assert len(out) == 1
    assert out[0]["error"] is None
    assert out[0]["version"] == "7"


def test_route_delete_ships_identity_only():
    """handleComponentDelete (mapping_handler.go:226-265): a DELETE element
    evaluates only id-referenced vars + the identifier. Failing field mappings
    or non-id vars error CREATE elements but never DELETE elements, and DELETE
    rows carry null typeName/name/tags/field outputs."""
    rules = [
        ComponentRule(
            identifier="m-mixed",
            sink="s",
            signal="LOGS",
            action="'DELETE' if severity == 'UNKNOWN' else 'CREATE'",
            vars={"v": "'p:' + missing_col"},  # fails every row it is evaluated on
            identifier_expr="'u:' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'t'",
            name_expr="role",
            additional_identifiers=["'x' + missing_col"],  # required, fails
        ).compile()
    ]
    out = _routed(
        [
            {"text": "no tokens", "conv_id": "c1", "turn_idx": 0},   # UNKNOWN -> DELETE
            {"text": "[INFO] x", "conv_id": "c1", "turn_idx": 1},    # CREATE
        ],
        rules,
    ).to_pylist()
    by_turn = {r["turn_idx"]: r for r in out}
    d, c = by_turn[0], by_turn[1]
    assert d["action"] == "DELETE" and d["error"] is None
    assert d["external_id"] == "u:c1/0"
    for col in ("type_name", "name", "tags", "identifiers", "configuration",
                "status", "version"):
        assert d[col] is None, col
    # the CREATE element still errors on the failing var (strict, eval.go:60-88)
    assert c["error"] is not None and c["error"].startswith("var v")


def test_route_delete_relation_ships_ids_only():
    rules = [
        RelationRule(
            identifier="m-rel-del",
            sink="s",
            signal="LOGS",
            action="'DELETE' if severity == 'UNKNOWN' else 'CREATE'",
            source_id_expr="'s:' + conv_id",
            target_id_expr="'t:' + conv_id",
            type_name_expr="'uses' + missing_col",       # never evaluated on DELETE
            dependency_type_expr="'weird' + missing_col",
        ).compile()
    ]
    out = _routed([{"text": "no tokens", "conv_id": "c2"}], rules).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert r["action"] == "DELETE" and r["error"] is None
    assert r["external_id"] == "s:c2-t:c2"
    assert r["source_id"] == "s:c2" and r["target_id"] == "t:c2"
    assert r["type_name"] is None and r["dependency_type"] is None


def test_encode_col_nested_map_values_uncached_path():
    """_encode_col's distinct-map memo: a map whose VALUES are lists/nested
    dicts builds the sorted key tuple fine but is unhashable at cache lookup —
    must fall through to the uncached encoding, not raise (round-3 ADVICE fix)."""
    from sts_opentelemetry_collector_ray.stages.route import _encode_col, _typed_repr

    sub = np.array(
        [{"a": [1, 2]}, {"a": {"b": 1}}, {"a": "x"}, {"a": [1, 2]}], dtype=object
    )
    enc = _encode_col(sub).to_pylist()
    assert enc == [_typed_repr(v) for v in sub]
