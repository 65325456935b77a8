"""Rule model — the engine's "settings snapshot".

Mirrors the reference's ``OtelComponentMapping`` / ``OtelRelationMapping`` settings
(reference: extension/settingsproviderextension/generated/settingsproto/model.gen.go:
855-1153) specialized to flat transcript rows: each rule has an optional CEL-lite
``condition`` (boolean), an ``action`` (CREATE/DELETE/CONTINUE — mapping_handler.go:
43-121), named ``vars`` expressions (eval.go:60-88), and an output projection —
component-style (identifier/name/type_name + tags incl. regex tag mapping,
mapping.go:36-245) or relation-style (source_id/target_id/type_name/dependency_type,
mapping.go:249-292).

Rules are data (JSON), loaded once on the driver, compiled to `CompiledExpr` plans and
broadcast to workers — the Ray translation of the settings-provider snapshot
(snapshot_manager.go:255-264): a ruleset change is a new pipeline run.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Optional

from .expr import CompiledExpr, compile_expr

ACTIONS = ("CREATE", "DELETE", "CONTINUE")

# Sensitive attribute keys stripped before any rule can see them (model.go:23-28).
SENSITIVE_ATTRS = ("sts_api_key", "client_sts_api_key", "server_sts_api_key")


@dataclass
class TagMapping:
    """Plain tag: ``target ← evalString(source)`` (mapping.go:167-180)."""

    source: str  # CEL-lite string expression
    target: str

    def compile(self) -> "CompiledTag":
        return CompiledTag(target=self.target, expr=compile_expr(self.source, "string"))


@dataclass
class RegexTagMapping:
    """Regex tag mapping (mapping.go:181-245): evaluate ``source`` to a map; for each
    key matching ``pattern``, expand the ``${1}``-style ``target`` template from the
    capture groups; values stringified (lists joined by space, maps JSON —
    mapping.go:323-346). Explicit (plain) tags win over regex-derived ones."""

    source: str  # expression evaluating to a map
    pattern: str
    target: str  # template with ${1}..${n}

    def compile(self) -> "CompiledRegexTag":
        return CompiledRegexTag(
            expr=compile_expr(self.source, "any"),
            pattern=re.compile(self.pattern),
            target=self.target,
        )


@dataclass
class CompiledTag:
    target: str
    expr: CompiledExpr


@dataclass
class CompiledRegexTag:
    expr: CompiledExpr
    pattern: "re.Pattern"
    target: str

    def expand(self, attrs: dict) -> dict[str, str]:
        out: dict[str, str] = {}
        for key, value in attrs.items():
            m = self.pattern.search(key)
            if not m:
                continue
            tag = _TEMPLATE_VAR.sub(
                lambda mm: m.group(int(mm.group(1))) if mm.group(1).isdigit() else "",
                self.target,
            )
            out[tag] = stringify_tag_value(value)
        return out


_TEMPLATE_VAR = re.compile(r"\$\{(\d+)\}")


def stringify_tag_value(value) -> str:
    """Tag value stringification (mapping.go:323-346): lists joined by space, maps as
    JSON, bools lowercase, everything else str()."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (list, tuple)):
        return " ".join(stringify_tag_value(v) for v in value)
    if isinstance(value, dict):
        return json.dumps(value, sort_keys=True, separators=(",", ":"))
    return str(value)


@dataclass
class Rule:
    identifier: str  # the mapping's own id == output data_source
    signal: str = "LOGS"
    # Per-level condition tree (model.gen.go:926-1070, visitor.go:36-107): the
    # resource-level condition is evaluated FIRST and prunes the subtree — rows it
    # rejects (or errors on, error ⇒ false) never see the leaf condition. The flat
    # table collapses resource→scope→leaf into columns, so two ordered predicates
    # express the tree; `condition` is the leaf/terminal-level predicate.
    resource_condition: Optional[str] = None
    condition: Optional[str] = None  # nil ⇒ true (mapping_handler.go:128-131)
    # nil ⇒ CREATE at terminal level; a constant in ACTIONS, or any other string is
    # compiled as a per-element CEL-lite expression (mapping_handler.go:103-121)
    action: Optional[str] = None
    vars: dict[str, str] = field(default_factory=dict)
    sink: str = "default"
    expire_after_ms: int = 900_000
    specificity: int = 100
    # Whether routed rows carry the raw turn text. The reference's topology
    # messages carry only the PROJECTED payload (identifier/name/tags —
    # topo_stream.pb.go:74-282), not the raw log body; metrics/relation sinks
    # here do the same, halving shuffle bytes. Log-style sinks keep the body.
    carry_text: bool = True


@dataclass
class ComponentRule(Rule):
    identifier_expr: str = "conv_id"  # required (error row on failure)
    name_expr: Optional[str] = None  # optional
    type_name_expr: str = "'turn'"
    tags: list[TagMapping] = field(default_factory=list)
    regex_tags: list[RegexTagMapping] = field(default_factory=list)
    # Output field mappings (mapping.go:65-150; model OtelComponentMappingFieldMapping
    # model.gen.go:880-918): required entries are strict (eval failure ⇒ error row),
    # optional entries lenient (failure ⇒ omitted/null); for configuration / status /
    # version, required WINS over optional when both produce a value.
    additional_identifiers: list[str] = field(default_factory=list)  # required/strict
    optional_additional_identifiers: list[str] = field(default_factory=list)  # lenient
    required_configuration: Optional[str] = None  # any-expr → canonical-JSON Struct
    optional_configuration: Optional[str] = None
    required_status: Optional[str] = None
    optional_status: Optional[str] = None
    required_version: Optional[str] = None  # string expr
    optional_version: Optional[str] = None

    def compile(self) -> "CompiledRule":
        return CompiledRule(self)


@dataclass
class RelationRule(Rule):
    source_id_expr: str = "conv_id"
    target_id_expr: str = "tool"
    type_name_expr: str = "'uses'"
    dependency_type_expr: str = "'CONNECTION'"

    def compile(self) -> "CompiledRule":
        return CompiledRule(self)


NORMALIZED_DEPENDENCY = {"HIERARCHICAL": "HIERARCHICAL", "CONNECTION": "CONNECTION"}


def normalize_dependency(value: str) -> str:
    """Case/space-insensitive dependency normalization (mapping.go:280-292)."""
    if not isinstance(value, str):
        return "UNSPECIFIED"
    return NORMALIZED_DEPENDENCY.get(value.strip().upper(), "UNSPECIFIED")


class CompiledRule:
    """A rule with every expression compiled (driver-side, once — the analogue of the
    reference's expression cache warm path, expression.go:309-407)."""

    def __init__(self, rule: Rule):
        self.rule = rule
        self.is_relation = isinstance(rule, RelationRule)
        self.resource_condition = (
            compile_expr(rule.resource_condition, "bool")
            if rule.resource_condition
            else None
        )
        self.condition = (
            compile_expr(rule.condition, "bool") if rule.condition else None
        )
        # Action is either a constant (fast path) or a CEL-lite *string expression*
        # evaluated per element (mapping_handler.go:103-121): eval error or a value
        # outside {CREATE, DELETE, CONTINUE} ⇒ the element is silently skipped.
        if rule.action is None or rule.action in ACTIONS:
            self.action: Optional[str] = rule.action or "CREATE"
            self.action_expr: Optional[CompiledExpr] = None
        else:
            self.action = None
            self.action_expr = compile_expr(rule.action, "string")
        self.vars = {k: compile_expr(v, "any") for k, v in rule.vars.items()}
        if self.is_relation:
            self.source_id = compile_expr(rule.source_id_expr, "string")
            self.target_id = compile_expr(rule.target_id_expr, "string")
            self.type_name = compile_expr(rule.type_name_expr, "string")
            self.dependency_type = compile_expr(rule.dependency_type_expr, "string")
            self.tags: list[CompiledTag] = []
            self.regex_tags: list[CompiledRegexTag] = []
            self.add_ids: list[CompiledExpr] = []
            self.opt_add_ids: list[CompiledExpr] = []
            self.req_configuration = self.opt_configuration = None
            self.req_status = self.opt_status = None
            self.req_version = self.opt_version = None
            self.has_field_outputs = False
        else:
            self.identifier = compile_expr(rule.identifier_expr, "string")
            self.name = compile_expr(rule.name_expr, "string") if rule.name_expr else None
            self.type_name = compile_expr(rule.type_name_expr, "string")
            self.tags = [t.compile() for t in rule.tags]
            self.regex_tags = [t.compile() for t in rule.regex_tags]
            # Field-mapping outputs (mapping.go:65-150).
            self.add_ids = [
                compile_expr(e, "string") for e in rule.additional_identifiers
            ]
            self.opt_add_ids = [
                compile_expr(e, "string")
                for e in rule.optional_additional_identifiers
            ]
            _c = lambda e, t: compile_expr(e, t) if e else None  # noqa: E731
            self.req_configuration = _c(rule.required_configuration, "any")
            self.opt_configuration = _c(rule.optional_configuration, "any")
            self.req_status = _c(rule.required_status, "any")
            self.opt_status = _c(rule.optional_status, "any")
            self.req_version = _c(rule.required_version, "string")
            self.opt_version = _c(rule.optional_version, "string")
            self.has_field_outputs = bool(
                self.add_ids
                or self.opt_add_ids
                or self.req_configuration
                or self.opt_configuration
                or self.req_status
                or self.opt_status
                or self.req_version
                or self.opt_version
            )

    @property
    def referenced_columns(self) -> set[str]:
        """Static AST walk over every expression — the ExpressionRef summary used for
        dedup-key projection (eval.go:15-54, expression_ref_manager.go:299-359).
        Var-indirection is resolved: referencing ``vars.x`` pulls in var x's refs."""
        refs: set[str] = set()
        exprs = [self.condition] if self.condition else []
        if self.resource_condition is not None:
            exprs.append(self.resource_condition)
        if self.action_expr is not None:
            exprs.append(self.action_expr)
        if self.is_relation:
            exprs += [self.source_id, self.target_id, self.type_name, self.dependency_type]
        else:
            exprs += [self.identifier, self.type_name] + ([self.name] if self.name else [])
            exprs += [t.expr for t in self.tags] + [t.expr for t in self.regex_tags]
            exprs += self.add_ids + self.opt_add_ids
            exprs += [
                e
                for e in (
                    self.req_configuration, self.opt_configuration,
                    self.req_status, self.opt_status,
                    self.req_version, self.opt_version,
                )
                if e is not None
            ]
        uses_vars = False
        for e in exprs:
            refs |= e.refs
            if "vars" in e.refs:
                uses_vars = True
        if uses_vars:
            for v in self.vars.values():
                refs |= v.refs
        refs.discard("vars")
        return refs


def load_ruleset(path_or_list) -> list[CompiledRule]:
    """Load rules from a JSON file path / list of dicts and compile them."""
    if isinstance(path_or_list, str):
        with open(path_or_list) as f:
            raw = json.load(f)
    else:
        raw = path_or_list
    out = []
    for r in raw:
        kind = r.pop("kind", "component")
        cls = RelationRule if kind == "relation" else ComponentRule
        if "tags" in r:
            r["tags"] = [TagMapping(**t) for t in r["tags"]]
        if "regex_tags" in r:
            r["regex_tags"] = [RegexTagMapping(**t) for t in r["regex_tags"]]
        out.append(cls(**r).compile())
    return out


def default_ruleset() -> list[CompiledRule]:
    """The fixture ruleset (FIXTURES.md F2): covers unconditional CREATE, severity
    predicate, tool routing, regex tag mapping, a relation rule, a DELETE rule, and a
    failing-required-expression rule (error rows). Modeled on the kubewarden e2e
    mappings (test/e2e/logtopology_test.go:414-552)."""
    rules: list[Rule] = [
        ComponentRule(
            identifier="urn:mapping:all-turns",
            sink="logs_all",
            identifier_expr="'urn:turn/' + conv_id + '/' + string(turn_idx)",
            name_expr="role",
            type_name_expr="'turn'",
        ),
        ComponentRule(
            identifier="urn:mapping:error-turns",
            sink="logs_errors",
            condition="severity == 'ERROR'",
            vars={"sig": "coalesce(tool_sig, 'none')"},
            identifier_expr="'urn:conv/' + conv_id + ':turn/' + string(turn_idx)",
            name_expr="vars.sig",
            type_name_expr="'error-turn'",
        ),
        ComponentRule(
            identifier="urn:mapping:tool-calls",
            sink="metrics_tools",
            condition="tool != '' and role == 'tool'",
            identifier_expr="'urn:tool/' + tool + '/call/' + conv_id + '/' + string(turn_idx)",
            name_expr="tool",
            type_name_expr="'tool-call'",
            carry_text=False,
        ),
        ComponentRule(
            identifier="urn:mapping:diag-turns",
            sink="logs_diag",
            condition="severity in ['WARN', 'DEBUG']",
            identifier_expr="'urn:diag/' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'diag-turn'",
            regex_tags=[
                RegexTagMapping(source="attrs", pattern=r"^attr\.(.+)$", target="t.${1}")
            ],
        ),
        RelationRule(
            identifier="urn:mapping:conv-uses-tool",
            sink="topology_relations",
            condition="tool != ''",
            source_id_expr="'urn:conv/' + conv_id",
            target_id_expr="'urn:tool/' + tool",
            type_name_expr="'uses'",
            dependency_type_expr="'connection'",
            carry_text=False,
        ),
        ComponentRule(
            identifier="urn:mapping:session-delete",
            sink="logs_all",
            condition="severity == 'UNKNOWN'",
            action="DELETE",
            identifier_expr="'urn:turn/' + conv_id + '/' + string(turn_idx)",
            type_name_expr="'turn'",
        ),
        ComponentRule(
            identifier="urn:mapping:bad-required",
            sink="logs_errors",
            condition="severity == 'ERROR'",
            identifier_expr="'urn:x/' + missing_attr_column",
            type_name_expr="'never'",
        ),
    ]
    return [r.compile() for r in rules]
