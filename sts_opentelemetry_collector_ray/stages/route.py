"""Router stage — rule-driven fan-out of turns into named sinks.

The analogue of the reference's topology connector core loop (reference:
connector/topologyconnector/internal/pipeline.go:102-150 — one visitor pass per
mapping; mapping_handler.go:43-145 — condition/action evaluation with eval-error ⇒
skip; mapping.go:36-292 — component/relation projection with required-strict /
optional-lenient semantics; message_builder.go:54-83 — failed elements become error
messages with shardId "unknown"; message_builder.go:259-263 — shardId =
fnv1a32(externalId) % 4).

Design: rules are the SMALL axis (tens), rows are the BIG axis (10^12) — so the router
loops over compiled rules *inside one `map_batches` UDF*, each rule evaluating
vectorized masks/projections over the whole Arrow batch. Rule artifacts are compiled
once on the driver and shipped to workers inside the stage callable (`Router` is an
actor-pool class: compile/pickle cost is paid once per actor, not per batch/task).

Every CREATE row also carries a ``dedup_key``: FNV-1a64 over a canonical sorted-key
encoding of ONLY the columns the rule's expressions reference — the ExpressionRef
projection of the reference's deduplicator (deduplicator.go:217-413, ExpressionRef
summaries expression_ref_manager.go:299-359).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64_array, shard_id_array
from ..rules.expr import canonical_json
from ..rules.model import CompiledRule, default_ruleset, normalize_dependency

ROUTED_SCHEMA = pa.schema(
    [
        ("sink", pa.string()),
        ("data_source", pa.string()),
        ("action", pa.string()),
        ("external_id", pa.string()),
        ("shard_id", pa.string()),  # '0'..'3' | 'unknown' for error rows
        ("name", pa.string()),
        ("type_name", pa.string()),
        ("tags", pa.string()),  # canonical JSON, null when rule has no tag mappings
        ("source_id", pa.string()),
        ("target_id", pa.string()),
        ("dependency_type", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("severity", pa.string()),
        ("text", pa.string()),
        ("ts", pa.timestamp("us")),
        ("error", pa.string()),
        ("dedup_key", pa.uint64()),  # fnv1a64 of the canonical projection (null = not gated)
    ]
)

_CARRY = ["conv_id", "turn_idx", "role", "tool", "severity", "text"]


def _batch_env(batch: pa.Table) -> tuple[dict, int]:
    env: dict = {}
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_map(col.type):
            env[name] = np.array(
                [dict(kv) if kv is not None else {} for kv in col.to_pylist()],
                dtype=object,
            )
        else:
            env[name] = np.asarray(col.to_numpy(zero_copy_only=False))
    return env, batch.num_rows


def _canonical_projection(env: dict, refs: list[str], idx: np.ndarray) -> np.ndarray:
    """Sorted-column ``col=<typed value>`` encoding joined by unit separators —
    the canonical dedup encoding (sorted keys + type tags, deduplicator.go:332-392)."""
    parts = []
    for col in refs:
        vals = env.get(col)
        if vals is None:
            parts.append(np.full(len(idx), f"{col}=\x00", dtype=object))
            continue
        sub = vals[idx]
        enc = np.array(
            [
                f"{col}=" + _typed_repr(v)
                for v in sub
            ],
            dtype=object,
        )
        parts.append(enc)
    if not parts:
        return np.full(len(idx), "", dtype=object)
    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(np.char.add(out.astype(str), "\x1f"), p.astype(str)).astype(object)
    return out


def _typed_repr(v) -> str:
    # Type-tagged values: floats via IEEE-754 bits, maps via sorted-key JSON —
    # mirrors deduplicator.go:332-392 so equal-valued different-typed cells differ.
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f:{np.float64(v).view(np.uint64)}"
    if isinstance(v, dict):
        return "m:" + canonical_json(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "l:" + canonical_json(list(v))
    return f"s:{v}"


class Router:
    """Actor-pool callable: compiled ruleset held per actor, applied per batch."""

    def __init__(self, rules: list[CompiledRule] | None = None, shard_count: int = 4):
        self.rules = rules if rules is not None else default_ruleset()
        self.shard_count = shard_count
        # Driver-computable ExpressionRef projections, resolved once (ST5/M6).
        self._refs = {r.rule.identifier: sorted(r.referenced_columns) for r in self.rules}

    def __call__(self, batch: pa.Table) -> pa.Table:
        env, n = _batch_env(batch)
        pieces: list[pa.Table] = []
        for rule in self.rules:
            t = self._apply_rule(rule, env, n)
            if t is not None and t.num_rows:
                pieces.append(t)
        if not pieces:
            return ROUTED_SCHEMA.empty_table()
        return pa.concat_tables(pieces)

    # -- one rule over one batch ------------------------------------------
    def _apply_rule(self, rule: CompiledRule, env: dict, n: int) -> pa.Table | None:
        if rule.condition is not None:
            mask = rule.condition.eval_bool_mask(env, n)
        else:
            mask = np.ones(n, dtype=bool)
        if rule.action == "CONTINUE":
            return None  # no terminal output at this level (mapping_handler.go:52-58)
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            return None
        sub_env = {
            k: (v[idx] if isinstance(v, np.ndarray) else v) for k, v in env.items()
        }
        m = idx.size

        err_mask = np.zeros(m, dtype=bool)
        err_msg = np.full(m, None, dtype=object)

        # vars: any failure fails the whole mapping for that element (eval.go:60-88).
        # DELETE evaluates only vars referenced by the id expressions (eval.go:15-54) —
        # approximated here by skipping vars entirely unless an id expr uses them.
        need_vars = rule.vars and (
            rule.action != "DELETE"
            or any(
                "vars" in e.refs
                for e in (
                    [rule.source_id, rule.target_id]
                    if rule.is_relation
                    else [rule.identifier]
                )
            )
        )
        if need_vars:
            var_vals: dict[str, np.ndarray] = {}
            for vname, vexpr in rule.vars.items():
                vals, errs, msg = vexpr.eval_batch(sub_env, m)
                var_vals[vname] = vals
                newly = errs & ~err_mask
                err_mask |= errs
                err_msg[newly] = f"var {vname}: {msg}"
            sub_env = dict(sub_env)
            sub_env["vars"] = var_vals

        def required(expr, label):
            nonlocal err_mask, err_msg
            vals, errs, msg = expr.eval_batch(sub_env, m)
            newly = errs & ~err_mask
            err_mask |= errs
            err_msg[newly] = f"{label}: {msg}"
            return vals

        if rule.is_relation:
            src = required(rule.source_id, "sourceId")
            tgt = required(rule.target_id, "targetId")
            tname = required(rule.type_name, "typeName")
            dep_raw = required(rule.dependency_type, "dependencyType")
            ok = ~err_mask
            ext = np.full(m, None, dtype=object)
            ext[ok] = np.char.add(
                np.char.add(src[ok].astype(str), "-"), tgt[ok].astype(str)
            ).astype(object)
            dep = np.full(m, None, dtype=object)
            dep[ok] = [normalize_dependency(v) for v in dep_raw[ok]]
            name_vals = np.full(m, None, dtype=object)
            tags_vals = np.full(m, None, dtype=object)
            src_o, tgt_o = src, tgt
        else:
            ext = required(rule.identifier, "identifier")
            tname = required(rule.type_name, "typeName")
            if rule.name is not None:
                # optional-lenient: errors yield null, no error row (mapping.go:348-359)
                name_vals, name_errs, _ = rule.name.eval_batch(sub_env, m)
                name_vals[name_errs] = None
            else:
                name_vals = np.full(m, None, dtype=object)
            tags_vals = self._eval_tags(rule, sub_env, m)
            src_o = np.full(m, None, dtype=object)
            tgt_o = np.full(m, None, dtype=object)
            dep = np.full(m, None, dtype=object)

        ok = ~err_mask
        shard = np.full(m, "unknown", dtype=object)
        if ok.any():
            shard[ok] = shard_id_array(ext[ok], self.shard_count).astype(str)

        dedup = np.full(m, None, dtype=object)
        if rule.action == "CREATE" and ok.any():
            refs = self._refs[rule.rule.identifier]
            canon = _canonical_projection(env, refs, idx[ok])
            prefix = f"{rule.rule.identifier}|{rule.rule.signal}|"
            keys = np.char.add(prefix, canon.astype(str))
            dedup[ok] = list(fnv1a64_array(keys))

        cols: dict[str, pa.Array] = {
            "sink": pa.array(np.full(m, rule.rule.sink, dtype=object), pa.string()),
            "data_source": pa.array(
                np.full(m, rule.rule.identifier, dtype=object), pa.string()
            ),
            "action": pa.array(np.full(m, rule.action, dtype=object), pa.string()),
            "external_id": pa.array(ext, pa.string()),
            "shard_id": pa.array(shard, pa.string()),
            "name": pa.array(name_vals, pa.string()),
            "type_name": pa.array(
                np.where(ok, tname, None), pa.string()
            ),
            "tags": pa.array(tags_vals, pa.string()),
            "source_id": pa.array(np.where(ok, src_o, None), pa.string()),
            "target_id": pa.array(np.where(ok, tgt_o, None), pa.string()),
            "dependency_type": pa.array(dep, pa.string()),
        }
        for c in _CARRY:
            vals = env.get(c)
            if vals is None:
                cols[c] = pa.nulls(m, ROUTED_SCHEMA.field(c).type)
            else:
                cols[c] = pa.array(vals[idx], ROUTED_SCHEMA.field(c).type)
        ts_vals = env.get("ts")
        if ts_vals is None:
            cols["ts"] = pa.nulls(m, pa.timestamp("us"))
        else:
            cols["ts"] = pa.array(pd.Series(ts_vals[idx]), pa.timestamp("us"))
        cols["error"] = pa.array(err_msg, pa.string())
        cols["dedup_key"] = pa.array(
            [int(v) if v is not None else None for v in dedup], pa.uint64()
        )
        return pa.table({f.name: cols[f.name] for f in ROUTED_SCHEMA})

    def _eval_tags(self, rule: CompiledRule, sub_env: dict, m: int) -> np.ndarray:
        if not rule.tags and not rule.regex_tags:
            return np.full(m, None, dtype=object)
        merged: list[dict] = [dict() for _ in range(m)]
        # Regex tags first, explicit tags overwrite (explicit wins, mapping.go:213-243).
        for rt in rule.regex_tags:
            vals, errs, _ = rt.expr.eval_batch(sub_env, m)
            for i in range(m):
                if errs[i] or not isinstance(vals[i], dict):
                    continue
                merged[i].update(rt.expand(vals[i]))
        for t in rule.tags:
            vals, errs, _ = t.expr.eval_batch(sub_env, m)
            for i in range(m):
                if not errs[i] and vals[i] is not None:
                    merged[i][t.target] = str(vals[i])
        return np.array([canonical_json(d) for d in merged], dtype=object)


def route_stage(
    ds: "ray.data.Dataset",
    rules: list[CompiledRule] | None = None,
    concurrency: int | None = None,
    batch_size: int = 32_768,
) -> "ray.data.Dataset":
    """Apply the ruleset as an actor-pool stage (rule compile amortized per actor)."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    # num_cpus<1 so the router pool shares cores with the surrounding stages —
    # reserving every core would starve read/sort/write and serialize the pipeline.
    return ds.map_batches(
        Router,
        fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=0.75,
        **kwargs,
    )
