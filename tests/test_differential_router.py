"""Differential test: the vectorized Router vs a NAIVE per-row reference
implementation of the mapping semantics (conditions with error⇒false, per-level
pruning, computed actions with silent skip, required-strict / optional-lenient
projections, DELETE-only-for-LOGS) — randomized rules × randomized rows.

The naive interpreter is deliberately the dumbest possible transcription of
mapping_handler.go / mapping.go: one Python dict per row, try/except per
expression. Any divergence from the vectorized engine is a bug in one of them.
"""

import numpy as np
import pyarrow as pa
import pytest

from sts_opentelemetry_collector_ray.rules.expr import canonical_json
from sts_opentelemetry_collector_ray.rules.model import (
    ComponentRule,
    RelationRule,
    normalize_dependency,
)
from sts_opentelemetry_collector_ray.stages.enrich import EnrichActor
from sts_opentelemetry_collector_ray.stages.parse import parse_batch
from sts_opentelemetry_collector_ray.stages.route import Router
from tests.test_stages import turns_table

ACTIONS = ("CREATE", "DELETE", "CONTINUE")


def _eval_row(expr_src, row):
    """Naive single-row CEL-lite eval via the engine's own row fallback —
    compile once, run the interpreter in scalar mode."""
    from sts_opentelemetry_collector_ray.rules.expr import compile_expr

    c = compile_expr(expr_src, "any")
    env = {k: np.array([v], dtype=object) for k, v in row.items() if k != "vars"}
    if "vars" in row:
        env["vars"] = {k: np.array([v], dtype=object) for k, v in row["vars"].items()}
    vals, errs, _ = c._eval_rows(env, 1)
    if errs[0]:
        raise ValueError("eval error")
    return vals[0]


def naive_apply(rule_obj, compiled, row):
    """Reference transcription of one rule over one row: returns None (skip),
    ('error', msg) or a dict of outputs."""
    # per-level conditions: resource prunes first, both error ⇒ false
    for cond in (rule_obj.resource_condition, rule_obj.condition):
        if cond:
            try:
                if not bool(_eval_row(cond, row)):
                    return None
            except ValueError:
                return None
    # action
    act = rule_obj.action
    if act is None:
        act = "CREATE"
    elif act not in ACTIONS:
        try:
            act = _eval_row(act, row)
        except ValueError:
            return None
        if act not in ("CREATE", "DELETE", "CONTINUE"):
            return None
    if act == "CONTINUE":
        return None
    if act == "DELETE" and rule_obj.signal != "LOGS":
        return None
    # vars: for DELETE, only id-referenced vars are evaluated (eval.go:15-54,
    # CollectVarReferences + FilterVarsByName — DELETE messages carry only the
    # identifier), so a failing non-id var never errors a DELETE element.
    row = dict(row)
    if rule_obj.vars:
        from sts_opentelemetry_collector_ray.rules.expr import compile_expr

        id_srcs = (
            [rule_obj.source_id_expr, rule_obj.target_id_expr]
            if isinstance(rule_obj, RelationRule)
            else [rule_obj.identifier_expr]
        )
        id_var_names: set | None = set()
        for s in id_srcs:
            vr = compile_expr(s, "any").var_refs()
            if vr is None:
                id_var_names = None
                break
            id_var_names |= vr
        vars_out = {}
        for vn, vs in rule_obj.vars.items():
            if act == "DELETE" and id_var_names is not None and vn not in id_var_names:
                continue
            try:
                vars_out[vn] = _eval_row(vs, row)
            except ValueError:
                return ("error", f"var {vn}")
        row["vars"] = vars_out
    # DELETE ships ONLY the identity (handleComponentDelete /
    # handleRelationDelete, mapping_handler.go:226-313): typeName, name, tags
    # and field outputs are neither evaluated nor shipped.
    if act == "DELETE":
        base = {
            "action": act, "type_name": None, "name": None, "tags": None,
            "identifiers": None, "configuration": None, "status": None,
            "version": None, "dependency_type": None,
            "source_id": None, "target_id": None,
        }
        if isinstance(rule_obj, RelationRule):
            try:
                src = str(_eval_row(rule_obj.source_id_expr, row))
                tgt = str(_eval_row(rule_obj.target_id_expr, row))
            except ValueError:
                return ("error", "required")
            return {**base, "external_id": f"{src}-{tgt}", "source_id": src, "target_id": tgt}
        try:
            ext = str(_eval_row(rule_obj.identifier_expr, row))
        except ValueError:
            return ("error", "required")
        return {**base, "external_id": ext}
    err = None
    if isinstance(rule_obj, RelationRule):
        try:
            src = str(_eval_row(rule_obj.source_id_expr, row))
            tgt = str(_eval_row(rule_obj.target_id_expr, row))
            tname = str(_eval_row(rule_obj.type_name_expr, row))
            dep = normalize_dependency(str(_eval_row(rule_obj.dependency_type_expr, row)))
        except ValueError:
            return ("error", "required")
        return {
            "action": act, "external_id": f"{src}-{tgt}", "source_id": src,
            "target_id": tgt, "type_name": tname, "dependency_type": dep,
            "name": None, "tags": None, "identifiers": None,
            "configuration": None, "status": None, "version": None,
        }
    try:
        ext = str(_eval_row(rule_obj.identifier_expr, row))
        tname = str(_eval_row(rule_obj.type_name_expr, row))
    except ValueError:
        return ("error", "required")
    name = None
    if rule_obj.name_expr:
        try:
            v = _eval_row(rule_obj.name_expr, row)
            name = None if v is None else str(v)
        except ValueError:
            name = None  # optional-lenient
    # tags: regex expansion first, explicit tags overwrite (mapping.go:213-243)
    tags = None
    if rule_obj.tags or rule_obj.regex_tags:
        merged = {}
        for rt in rule_obj.regex_tags:
            try:
                src = _eval_row(rt.source, row)
            except ValueError:
                continue
            if isinstance(src, dict):
                merged.update(rt.compile().expand(src))
        for tg in rule_obj.tags:
            try:
                v = _eval_row(tg.source, row)
                if v is not None:
                    merged[tg.target] = str(v)
            except ValueError:
                pass
        tags = canonical_json(merged)
    # field outputs (mapping.go:65-150): identifiers order = identifier,
    # optional additions (lenient), required additions (strict); required
    # wins for configuration/status/version; non-map ⇒ null Struct.
    ids = [ext]
    for e in rule_obj.optional_additional_identifiers:
        try:
            v = _eval_row(e, row)
            if v is not None:
                ids.append(str(v))
        except ValueError:
            pass
    for e in rule_obj.additional_identifiers:
        try:
            ids.append(str(_eval_row(e, row)))
        except ValueError:
            return ("error", "required.additionalIdentifiers")

    def any_field(req, opt):
        out = None
        if req:
            try:
                v = _eval_row(req, row)
                if isinstance(v, dict):
                    out = canonical_json(v)
            except ValueError:
                return ("error", "required")
        if out is None and opt:
            try:
                v = _eval_row(opt, row)
                if isinstance(v, dict):
                    out = canonical_json(v)
            except ValueError:
                pass
        return out

    cfg = any_field(rule_obj.required_configuration, rule_obj.optional_configuration)
    if isinstance(cfg, tuple):
        return ("error", "required.configuration")
    st = any_field(rule_obj.required_status, rule_obj.optional_status)
    if isinstance(st, tuple):
        return ("error", "required.status")
    has_field_outputs = bool(
        rule_obj.additional_identifiers or rule_obj.optional_additional_identifiers
        or rule_obj.required_configuration or rule_obj.optional_configuration
        or rule_obj.required_status or rule_obj.optional_status
        or rule_obj.required_version or rule_obj.optional_version
    )
    has_add_ids = bool(
        rule_obj.additional_identifiers or rule_obj.optional_additional_identifiers
    )
    version = None
    if rule_obj.required_version:
        try:
            v = _eval_row(rule_obj.required_version, row)
            version = None if v is None else str(v)
        except ValueError:
            return ("error", "required.version")
    if version is None and rule_obj.optional_version:
        try:
            v = _eval_row(rule_obj.optional_version, row)
            version = None if v is None else str(v)
        except ValueError:
            pass
    return {
        "action": act, "external_id": ext, "type_name": tname, "name": name,
        "source_id": None, "target_id": None, "dependency_type": None, "tags": tags,
        "identifiers": canonical_json(ids) if (has_field_outputs and has_add_ids) else None,
        "configuration": cfg if has_field_outputs else None,
        "status": st if has_field_outputs else None,
        "version": version if has_field_outputs else None,
    }


def _random_rules(rng):
    sevs = ["INFO", "WARN", "ERROR", "DEBUG", "UNKNOWN"]
    rules = []
    for i in range(rng.integers(3, 8)):
        kind = rng.integers(0, 5)
        cond = (
            None
            if rng.random() < 0.3
            else f"severity == '{sevs[rng.integers(0, 5)]}'"
            if rng.random() < 0.6
            else f"tool != '' and severity in ['{sevs[rng.integers(0, 5)]}', 'ERROR']"
        )
        rcond = None if rng.random() < 0.6 else f"role == '{['user','tool','assistant'][rng.integers(0,3)]}'"
        action = rng.choice(
            [
                None, "CREATE", "DELETE",
                "'DELETE' if severity == 'UNKNOWN' else 'CREATE'",
                "'CREATE' if tool != '' else 'SKIPME'",
            ]
        )
        signal = rng.choice(["LOGS", "METRICS"])
        if kind == 4:
            rel_vars = (
                {"sig": "coalesce(tool_sig, 'none')"} if rng.random() < 0.4 else {}
            )
            src_expr = (
                "'urn:c/' + conv_id + '/' + vars.sig" if (rel_vars and rng.random() < 0.5)
                else "'urn:c/' + conv_id"
            )
            rules.append(
                RelationRule(
                    identifier=f"rel-{i}", sink=f"s{i % 3}", signal=signal,
                    resource_condition=rcond, condition=cond, action=action,
                    vars=rel_vars,
                    source_id_expr=src_expr,
                    target_id_expr="'urn:t/' + tool",
                    type_name_expr="'uses'",
                    dependency_type_expr=rng.choice(
                        ["'connection'", "'HIERARCHICAL'", "'weird'"]
                    ),
                )
            )
        else:
            name_expr = rng.choice([None, "role", "'n:' + missing_col", "vars.sig"])
            vars_ = (
                {"sig": "coalesce(tool_sig, 'none')"}
                if (name_expr == "vars.sig" or rng.random() < 0.3)
                else {}
            )
            # vars + COMPUTED action is in scope: the engine evaluates vars
            # batch-wide but masks errors/outputs per element, matching the
            # reference's per-element DELETE pruning (round-3 fix).
            ident = rng.choice(
                [
                    "'u:' + conv_id + '/' + string(turn_idx)",
                    "'x:' + missing_col",  # required failure -> error row
                    "'t:' + tool",
                ]
            )
            fields = {}
            if rng.random() < 0.5:
                fields["additional_identifiers"] = (
                    ["'a:' + conv_id"] if rng.random() < 0.7 else ["'a:' + missing_col"]
                )
                fields["optional_additional_identifiers"] = ["'o:' + tool", "'x' + missing_col"]
            if rng.random() < 0.5:
                fields["required_configuration"] = rng.choice(
                    ["pick(attrs, ['attr.env'])", "'notamap'"]
                )
                fields["optional_configuration"] = "attrs"
            if rng.random() < 0.4:
                fields["optional_status"] = rng.choice(["omit(attrs, [])", "'alive'"])
            if rng.random() < 0.4:
                fields["optional_version"] = "'v-' + role"
            if rng.random() < 0.5:
                from sts_opentelemetry_collector_ray.rules.model import (
                    RegexTagMapping,
                    TagMapping,
                )

                fields["regex_tags"] = [
                    RegexTagMapping(source="attrs", pattern=r"^attr\.(.+)$", target="t.${1}")
                ]
                if rng.random() < 0.5:
                    fields["tags"] = [TagMapping(source="role", target="t.env")]
            rules.append(
                ComponentRule(
                    identifier=f"comp-{i}", sink=f"s{i % 3}", signal=signal,
                    resource_condition=rcond, condition=cond, action=action,
                    vars=vars_, identifier_expr=ident,
                    name_expr=name_expr, type_name_expr=f"'t{i}'",
                    **fields,
                )
            )
    return rules


@pytest.mark.parametrize("seed", list(range(1, 17)))
def test_router_matches_naive_reference(seed):
    rng = np.random.default_rng(seed)
    sevs = np.array(["INFO", "WARN", "ERROR", "DEBUG"])
    tools = np.array(["", "bash", "search"])
    roles = np.array(["user", "tool", "assistant"])
    n = 120
    rows = []
    for i in range(n):
        sev = sevs[rng.integers(0, 4)]
        tool = tools[rng.integers(0, 3)]
        attr = " attr.env=prod attr.zone=z1" if rng.random() < 0.4 else ""
        text = (
            "no tokens here"
            if rng.random() < 0.1
            else f"[{sev}] m k={i}" + (f" call:{tool}(q{i})" if tool else "") + attr
        )
        rows.append(
            {
                "conv_id": f"c{i % 9}",
                "turn_idx": i,
                "role": roles[rng.integers(0, 3)],
                "tool": tool,
                "text": text,
            }
        )
    batch = EnrichActor()(parse_batch(turns_table(rows)))
    rules = _random_rules(rng)
    compiled = [r.compile() for r in rules]
    got = Router(rules=compiled)(batch).to_pylist()

    # naive expectation, keyed per (rule, row). Map columns arrive from
    # to_pylist as key/value tuple lists (None when absent) — the engine's
    # batch env materializes them as dicts with null ⇒ EMPTY map (the
    # reference's pcommon.Map is never nil), so mirror that here.
    batch_rows = []
    for row in batch.to_pylist():
        row = dict(row)
        a = row.get("attrs")
        row["attrs"] = dict(a) if a is not None else {}
        batch_rows.append(row)
    expected = []
    for rule_obj in rules:
        for row in batch_rows:
            r = naive_apply(rule_obj, None, row)
            if r is None:
                continue
            if isinstance(r, tuple):
                expected.append((rule_obj.identifier, row["turn_idx"], "ERROR"))
            else:
                expected.append(
                    (rule_obj.identifier, row["turn_idx"], r["action"],
                     r["external_id"], r["type_name"], r["name"],
                     r["source_id"], r["target_id"], r["dependency_type"],
                     r["tags"], r["identifiers"], r["configuration"], r["status"],
                     r["version"])
                )
    got_keys = []
    for r in got:
        if r["error"] is not None:
            got_keys.append((r["data_source"], r["turn_idx"], "ERROR"))
        else:
            got_keys.append(
                (r["data_source"], r["turn_idx"], r["action"], r["external_id"],
                 r["type_name"], r["name"], r["source_id"], r["target_id"],
                 r["dependency_type"], r["tags"], r["identifiers"],
                 r["configuration"], r["status"], r["version"])
            )
    assert sorted(map(str, got_keys)) == sorted(map(str, expected)), (
        f"seed {seed}: {len(got_keys)} engine rows vs {len(expected)} naive rows"
    )
