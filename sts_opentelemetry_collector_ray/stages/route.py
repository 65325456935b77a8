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

from ..functions.hashing import fnv1a32_arrow, fnv1a64_arrow
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
        # Field-mapping outputs (mapping.go:65-150): populated only for component
        # rules that DEFINE them (null otherwise — [external_id] is implied, so the
        # hot path pays nothing). identifiers order: identifier, optional
        # additional (lenient, omitted on failure), required additional (strict).
        ("identifiers", pa.string()),  # canonical JSON list
        ("configuration", pa.string()),  # canonical JSON Struct (maps only)
        ("status", pa.string()),  # canonical JSON Struct (maps only)
        ("version", pa.string()),
        # Payload envelope fields (topo_stream.pb.go:501-714, model.gen.go:920-924)
        # for downstream TTL / merge-priority consumers.
        ("expire_after_ms", pa.int64()),
        ("specificity", pa.float64()),  # rank.specificity; null for relations
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


class _LazyMap:
    """Arrow map column materialized to python dicts only on first access (and only
    for the row subset in play) — rules that never reference `attrs` never pay."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

    def take(self, idx: np.ndarray) -> "_LazyMap":
        return _LazyMap(self.arr.take(pa.array(idx)))

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, i):
        # row access for the per-row eval fallback path
        kv = self.arr[i].as_py()
        return dict(kv) if kv is not None else {}

    def materialize(self) -> np.ndarray:
        # flat decode: one to_pylist per child array + zip-slice per row is
        # ~2× faster than per-row MapScalar.as_py (measured 1.06s → 0.50s per
        # 100k rows); each row still gets a FRESH dict (no aliasing).
        arr = self.arr
        n = len(arr)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        keys = arr.keys.to_pylist()
        vals = arr.items.to_pylist()
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        out = np.empty(n, dtype=object)
        for i in range(n):
            out[i] = (
                dict(zip(keys[offs[i] : offs[i + 1]], vals[offs[i] : offs[i + 1]]))
                if valid[i]
                else {}
            )
        return out


class _EnvDict(dict):
    """Env whose lazy map columns materialize on first read."""

    def __getitem__(self, key):
        v = super().__getitem__(key)
        if isinstance(v, _LazyMap):
            v = v.materialize()
            super().__setitem__(key, v)
        return v


def _batch_env(batch: pa.Table) -> tuple[_EnvDict, int]:
    env = _EnvDict()
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_map(col.type):
            env[name] = _LazyMap(col)
        else:
            env[name] = np.asarray(col.to_numpy(zero_copy_only=False))
    return env, batch.num_rows


def _encode_col(sub: np.ndarray) -> pa.Array:
    """Vectorized typed-value encoding of one column subset (see _typed_repr) —
    returns an Arrow string array (null = absent value)."""
    import pyarrow.compute as pc

    if sub.dtype.kind in "iu":
        return pc.binary_join_element_wise(
            "i:", pc.cast(pa.array(sub.astype(np.int64)), pa.string()), ""
        )
    if sub.dtype.kind == "f":
        bits = sub.astype(np.float64).view(np.uint64)
        return pc.binary_join_element_wise(
            "f:", pc.cast(pa.array(bits), pa.string()), ""
        )
    if sub.dtype.kind == "b":
        return pc.binary_join_element_wise(
            "b:", pc.cast(pa.array(sub.astype(np.int8)), pa.string()), ""
        )
    sample = next((v for v in sub if v is not None), None)
    if sample is None or isinstance(sample, str):
        return pc.binary_join_element_wise("s:", pa.array(sub, pa.string()), "")
    if isinstance(sample, dict):
        # attr maps repeat massively — encode each DISTINCT map once per batch
        cache: dict = {}
        out = np.empty(len(sub), dtype=object)
        for i, v in enumerate(sub):
            # cache.get must sit inside the guard too: a map whose VALUES are
            # lists/nested dicts builds the sorted tuple fine (sorted compares
            # keys only) but is unhashable at lookup time.
            try:
                key = tuple(sorted(v.items())) if isinstance(v, dict) else v
                hit = cache.get(key)
                if hit is None:
                    hit = cache[key] = _typed_repr(v)
            except TypeError:
                hit = _typed_repr(v)
            out[i] = hit
        return pa.array(out, pa.string())
    return pa.array([_typed_repr(v) for v in sub], pa.string())


def _canonical_projection(sub_env: dict, refs: list[str], m: int) -> pa.Array:
    """Sorted-column ``col=<typed value>`` encoding joined by unit separators —
    the canonical dedup encoding (sorted keys + type tags, deduplicator.go:332-392).
    One Arrow join kernel; null cells encode as ``col=\\x00``."""
    import pyarrow.compute as pc

    args: list = []
    for i, col in enumerate(refs):
        if i:
            args.append("\x1f")
        args.append(f"{col}=")
        if col not in sub_env:
            args.append("\x00")
            continue
        enc = _encode_col(np.asarray(sub_env[col]))
        args.append(pc.fill_null(enc, "\x00"))
    if not args:
        return pa.array([""] * m, pa.string())
    if len(args) == 1:
        args.append("")
    return pc.binary_join_element_wise(*args, "")


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
        # Memoized tag expansion/serialization (ST2 cache analogue), per instance.
        self._tag_cache: dict = {}
        # All columns a rule's expressions may touch (outputs + vars), for slicing
        # the per-rule sub-environment to just what is needed.
        self._env_cols: dict[str, set] = {}
        # Vars the id expressions reference (CollectVarReferences, eval.go:15-32):
        # only these stay strict for DELETE elements; None = dynamic access,
        # fall back to "all vars needed" like the reference's nil result.
        self._id_var_names: dict[str, set | None] = {}
        for r in self.rules:
            id_exprs = (
                [r.source_id, r.target_id] if r.is_relation else [r.identifier]
            )
            names: set | None = set()
            for e in id_exprs:
                vr = e.var_refs()
                if vr is None:
                    names = None
                    break
                names |= vr
            self._id_var_names[r.rule.identifier] = names
        for r in self.rules:
            cols = set(r.referenced_columns)
            for v in r.vars.values():
                cols |= v.refs - {"vars"}
            self._env_cols[r.rule.identifier] = cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        env, n = _batch_env(batch)
        pieces: list[pa.Table] = []
        cond_cache: dict[str, np.ndarray] = {}  # full-width masks shared across rules
        for rule in self.rules:
            t = self._apply_rule(rule, env, n, batch, cond_cache)
            if t is not None and t.num_rows:
                pieces.append(t)
        if not pieces:
            return ROUTED_SCHEMA.empty_table()
        return pa.concat_tables(pieces)

    # -- one rule over one batch ------------------------------------------
    def _apply_rule(
        self,
        rule: CompiledRule,
        env: dict,
        n: int,
        batch: pa.Table | None = None,
        cond_cache: dict[str, np.ndarray] | None = None,
    ) -> pa.Table | None:
        def cond_mask(expr) -> np.ndarray:
            # Common-condition elimination: large rulesets share conditions
            # (same severity/tool guards across many mappings); the first rule
            # to evaluate one caches the full-width mask for the batch.
            key = expr.source
            if cond_cache is not None:
                cached = cond_cache.get(key)
                if cached is not None:
                    return cached
            # Arrow-kernel fast path on the original columns; generic numpy
            # interpreter as fallback (identical null/error semantics)
            m = None
            if batch is not None:
                m = expr.eval_bool_mask_table(batch, n)
            if m is None:
                m = expr.eval_bool_mask(env, n)
            if cond_cache is not None:
                cond_cache[key] = m
            return m

        if rule.action == "CONTINUE":
            return None  # no terminal output at this level (mapping_handler.go:52-58)
        if rule.action == "DELETE" and rule.rule.signal != "LOGS":
            return None  # DELETE terminal-valid only for LOGS (mapping_handler.go:72-99)
        # Per-level condition tree (visitor.go:36-107): the resource-level
        # condition prunes the subtree FIRST — leaf conditions evaluate only over
        # the surviving row subset, never over pruned rows.
        if rule.resource_condition is not None:
            rmask = cond_mask(rule.resource_condition)
            ridx = np.nonzero(rmask)[0]
            if ridx.size == 0:
                return None
            if rule.condition is not None:
                cenv: dict = {}
                for k in rule.condition.refs:
                    if k not in env:
                        continue
                    v = dict.__getitem__(env, k)
                    cenv[k] = (
                        v.take(ridx).materialize()
                        if isinstance(v, _LazyMap)
                        else v[ridx]
                    )
                lmask = rule.condition.eval_bool_mask(cenv, ridx.size)
                idx = ridx[lmask]
            else:
                idx = ridx
        elif rule.condition is not None:
            idx = np.nonzero(cond_mask(rule.condition))[0]
        else:
            idx = np.arange(n)
        if idx.size == 0:
            return None
        sub_env: dict = {}
        for k in self._env_cols[rule.rule.identifier]:
            if k not in env:
                continue
            v = dict.__getitem__(env, k)  # raw: avoid materializing full lazy maps
            if isinstance(v, _LazyMap):
                sub_env[k] = v.take(idx).materialize()
            else:
                sub_env[k] = v[idx]
        m = idx.size

        # Computed action: evaluate the string expression per element; eval error,
        # CONTINUE, an unknown value, or DELETE on a non-LOGS signal all silently
        # skip the element (mapping_handler.go:72-121 — no error row).
        if rule.action_expr is not None:
            act_vals, act_errs, _ = rule.action_expr.eval_batch(sub_env, m)
            valid = act_vals == "CREATE"
            if rule.rule.signal == "LOGS":
                valid |= act_vals == "DELETE"
            keep = ~act_errs & valid
            if not keep.any():
                return None
            action_arr = act_vals.astype(object)
            if not keep.all():
                idx = idx[keep]
                sub_env = {k: v[keep] for k, v in sub_env.items()}
                action_arr = action_arr[keep]
                m = idx.size
        else:
            action_arr = np.full(m, rule.action, dtype=object)

        err_mask = np.zeros(m, dtype=bool)
        err_msg = np.full(m, None, dtype=object)

        # vars: any failure fails the whole mapping for that element (eval.go:60-88).
        # DELETE evaluates only vars referenced by the id expressions (eval.go:15-54) —
        # approximated here by skipping vars entirely unless an id expr uses them.
        id_uses_vars = any(
            "vars" in e.refs
            for e in (
                [rule.source_id, rule.target_id]
                if rule.is_relation
                else [rule.identifier]
            )
        )
        # DELETE elements evaluate only identity: a failing var or field mapping
        # on a DELETE element must not emit an error row unless the id exprs
        # reference vars (eval.go:15-54 evaluates id-referenced vars only).
        non_delete = action_arr != "DELETE"
        need_vars = rule.vars and (id_uses_vars or bool(non_delete.any()))
        if need_vars:
            id_var_names = self._id_var_names[rule.rule.identifier]
            var_vals: dict[str, np.ndarray] = {}
            for vname, vexpr in rule.vars.items():
                vals, errs, msg = vexpr.eval_batch(sub_env, m)
                var_vals[vname] = vals
                # Per-var filtering (FilterVarsByName): a var the id exprs do
                # not reference is never evaluated for a DELETE element, so its
                # failure cannot error that element.
                if id_var_names is not None and vname not in id_var_names:
                    errs = errs & non_delete
                newly = errs & ~err_mask
                err_mask |= errs
                err_msg[newly] = f"var {vname}: {msg}"
            sub_env = dict(sub_env)
            sub_env["vars"] = var_vals

        def required(expr, label, allowed=None):
            nonlocal err_mask, err_msg
            vals, errs, msg = expr.eval_batch(sub_env, m)
            if allowed is not None:
                errs = errs & allowed
            newly = errs & ~err_mask
            err_mask |= errs
            err_msg[newly] = f"{label}: {msg}"
            return vals

        ids_vals = np.full(m, None, dtype=object)
        config_vals = np.full(m, None, dtype=object)
        status_vals = np.full(m, None, dtype=object)
        version_vals = np.full(m, None, dtype=object)

        if rule.is_relation:
            src = required(rule.source_id, "sourceId")
            tgt = required(rule.target_id, "targetId")
            # DELETE relations ship only sourceId-targetId (handleRelationDelete,
            # mapping_handler.go:267-313): typeName / dependencyType are neither
            # evaluated nor shipped for DELETE elements.
            tname = required(rule.type_name, "typeName", allowed=non_delete)
            dep_raw = required(rule.dependency_type, "dependencyType", allowed=non_delete)
            ok = ~err_mask
            if not non_delete.all():
                tname = np.where(non_delete, tname, None)
            ext = np.full(m, None, dtype=object)
            if ok.any():
                # CLAUDE.md rule: binary_join_element_wise ≫ np.char (16×)
                import pyarrow.compute as _pc
                joined = _pc.binary_join_element_wise(
                    pa.array(src[ok].astype(str), pa.string()),
                    "-",
                    pa.array(tgt[ok].astype(str), pa.string()),
                    "",
                )
                ext[ok] = joined.to_numpy(zero_copy_only=False)
            dep = np.full(m, None, dtype=object)
            sel = ok & non_delete & np.array(
                [v is not None for v in dep_raw], dtype=bool
            )
            if sel.any():
                # normalize once per DISTINCT value (usually a constant expr)
                uniq, inv = np.unique(dep_raw[sel].astype(str), return_inverse=True)
                dep[sel] = np.array(
                    [normalize_dependency(v) for v in uniq], dtype=object
                )[inv]
            name_vals = np.full(m, None, dtype=object)
            tags_vals = np.full(m, None, dtype=object)
            src_o, tgt_o = src, tgt
        else:
            ext = required(rule.identifier, "identifier")
            # DELETE components ship only the identifier (handleComponentDelete,
            # mapping_handler.go:226-265): typeName / name / tags / field outputs
            # are neither evaluated nor shipped for DELETE elements.
            tname = required(rule.type_name, "typeName", allowed=non_delete)
            if rule.name is not None:
                # optional-lenient: errors yield null, no error row (mapping.go:348-359)
                name_vals, name_errs, _ = rule.name.eval_batch(sub_env, m)
                name_vals[name_errs] = None
            else:
                name_vals = np.full(m, None, dtype=object)
            tags_vals = self._eval_tags(rule, sub_env, m)
            if rule.has_field_outputs:
                def required_nd(expr, label, _nd=non_delete):
                    return required(expr, label, allowed=_nd)

                ids_vals, config_vals, status_vals, version_vals = (
                    self._eval_field_outputs(rule, sub_env, m, ext, required_nd)
                )
            if not non_delete.all():
                tname = np.where(non_delete, tname, None)
                name_vals = np.where(non_delete, name_vals, None)
                tags_vals = np.where(non_delete, tags_vals, None)
                ids_vals = np.where(non_delete, ids_vals, None)
                config_vals = np.where(non_delete, config_vals, None)
                status_vals = np.where(non_delete, status_vals, None)
                version_vals = np.where(non_delete, version_vals, None)
            src_o = np.full(m, None, dtype=object)
            tgt_o = np.full(m, None, dtype=object)
            dep = np.full(m, None, dtype=object)

        import pyarrow.compute as pc

        ok = ~err_mask
        shard = np.full(m, "unknown", dtype=object)
        if ok.any():
            ext_arr = pa.array(ext[ok], pa.string())
            shards = fnv1a32_arrow(ext_arr) % np.uint64(self.shard_count)
            shard[ok] = shards.astype(np.int32).astype(str)

        create_ok = ok & (action_arr == "CREATE")
        if create_ok.any():
            refs = self._refs[rule.rule.identifier]
            canon = _canonical_projection(sub_env, refs, m)
            prefix = f"{rule.rule.identifier}|{rule.rule.signal}|"
            keys = pc.binary_join_element_wise(prefix, canon, "")
            hashes = fnv1a64_arrow(keys)
            # masked uint64 build: no per-row Python int()/list() on the output path
            dedup_arr = pa.array(hashes, pa.uint64(), mask=~create_ok)
        else:
            dedup_arr = pa.nulls(m, pa.uint64())

        cols: dict[str, pa.Array] = {
            "sink": pa.array(np.full(m, rule.rule.sink, dtype=object), pa.string()),
            "data_source": pa.array(
                np.full(m, rule.rule.identifier, dtype=object), pa.string()
            ),
            "action": pa.array(action_arr, pa.string()),
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
            if vals is None or (c == "text" and not rule.rule.carry_text):
                cols[c] = pa.nulls(m, ROUTED_SCHEMA.field(c).type)
            else:
                cols[c] = pa.array(vals[idx], ROUTED_SCHEMA.field(c).type)
        ts_vals = env.get("ts")
        if ts_vals is None:
            cols["ts"] = pa.nulls(m, pa.timestamp("us"))
        else:
            cols["ts"] = pa.array(pd.Series(ts_vals[idx]), pa.timestamp("us"))
        cols["identifiers"] = pa.array(np.where(ok, ids_vals, None), pa.string())
        cols["configuration"] = pa.array(np.where(ok, config_vals, None), pa.string())
        cols["status"] = pa.array(np.where(ok, status_vals, None), pa.string())
        cols["version"] = pa.array(np.where(ok, version_vals, None), pa.string())
        cols["expire_after_ms"] = pa.array(
            np.full(m, rule.rule.expire_after_ms, dtype=np.int64), pa.int64()
        )
        cols["specificity"] = (
            pa.nulls(m, pa.float64())  # relations carry no rank (model.gen.go:1078)
            if rule.is_relation
            else pa.array(np.full(m, float(rule.rule.specificity)), pa.float64())
        )
        cols["error"] = pa.array(err_msg, pa.string())
        cols["dedup_key"] = dedup_arr
        return pa.table({f.name: cols[f.name] for f in ROUTED_SCHEMA})

    def _eval_field_outputs(self, rule: CompiledRule, sub_env: dict, m: int, ext, required):
        """Field-mapping outputs (mapping.go:65-150): identifiers list, configuration
        / status Structs (canonical JSON; non-map values convert to null exactly like
        ``toStructValue``, mapping.go:295-312), version string. Required entries are
        strict (error row via ``required``), optional lenient; required WINS over
        optional. Per-row loops here are gated behind ``rule.has_field_outputs`` —
        rules without field outputs never reach this code."""
        ids: list[list] = [[v] for v in ext]
        for e in rule.opt_add_ids:
            vals, errs, _ = e.eval_batch(sub_env, m)
            for i in range(m):
                if not errs[i] and vals[i] is not None:
                    ids[i].append(str(vals[i]))
        for e in rule.add_ids:
            vals = required(e, "required.additionalIdentifiers")
            for i in range(m):
                if vals[i] is not None:
                    ids[i].append(str(vals[i]))
        if rule.add_ids or rule.opt_add_ids:
            ids_vals = np.array(
                [
                    canonical_json([x for x in row if x is not None])
                    if row[0] is not None
                    else None
                    for row in ids
                ],
                dtype=object,
            )
        else:
            ids_vals = np.full(m, None, dtype=object)

        def any_field(req, opt, label):
            out = np.full(m, None, dtype=object)
            if req is None and opt is None:
                return out
            if req is not None:
                vals = required(req, f"required.{label}")
                for i in range(m):
                    if isinstance(vals[i], dict):
                        out[i] = canonical_json(vals[i])
            if opt is not None:
                vals, errs, _ = opt.eval_batch(sub_env, m)
                for i in range(m):
                    if out[i] is None and not errs[i] and isinstance(vals[i], dict):
                        out[i] = canonical_json(vals[i])
            return out

        def str_field(req, opt, label):
            out = np.full(m, None, dtype=object)
            if req is None and opt is None:
                return out
            if req is not None:
                vals = required(req, f"required.{label}")
                # stringify like the optional path / toString (mapping.go:295-312):
                # a non-string required value (e.g. an int column) must become its
                # string form, not crash pa.array(..., pa.string()) later.
                conv = np.array(
                    [str(v) if v is not None else None for v in vals], dtype=object
                )
                has = np.array([v is not None for v in vals])
                out[has] = conv[has]
            if opt is not None:
                vals, errs, _ = opt.eval_batch(sub_env, m)
                fill = np.array(
                    [out[i] is None and not errs[i] and vals[i] is not None for i in range(m)]
                )
                if fill.any():
                    out[fill] = np.array([str(v) if v is not None else None for v in vals], dtype=object)[fill]
            return out

        config_vals = any_field(rule.req_configuration, rule.opt_configuration, "configuration")
        status_vals = any_field(rule.req_status, rule.opt_status, "status")
        version_vals = str_field(rule.req_version, rule.opt_version, "version")
        return ids_vals, config_vals, status_vals, version_vals

    def _eval_tags(self, rule: CompiledRule, sub_env: dict, m: int) -> np.ndarray:
        if not rule.tags and not rule.regex_tags:
            return np.full(m, None, dtype=object)
        merged: list[dict] = [dict() for _ in range(m)]
        # Regex tags first, explicit tags overwrite (explicit wins, mapping.go:213-243).
        # Expansion is MEMOIZED by the source map's items: log attribute maps are
        # highly repetitive, so the regex walk + template expansion runs once per
        # distinct map — the engine's analogue of the reference's bounded regex /
        # template caches (mapping.go:19-31, factory.go:112-121, 2k entries each).
        for rt in rule.regex_tags:
            vals, errs, _ = rt.expr.eval_batch(sub_env, m)
            cache = self._tag_cache.setdefault(id(rt), {})
            for i in range(m):
                if errs[i] or not isinstance(vals[i], dict):
                    continue
                try:
                    # cache.get inside the guard: unhashable VALUES pass sorted()
                    # (keys compare) but raise at hash time.
                    key = tuple(sorted(vals[i].items()))
                    hit = cache.get(key)
                    if hit is None:
                        if len(cache) > 4096:  # bounded, like the reference's caches
                            cache.clear()
                        hit = rt.expand(vals[i])
                        cache[key] = hit
                except TypeError:  # nested/unhashable values: uncached path
                    hit = rt.expand(vals[i])
                merged[i].update(hit)
        for t in rule.tags:
            vals, errs, _ = t.expr.eval_batch(sub_env, m)
            for i in range(m):
                if not errs[i] and vals[i] is not None:
                    merged[i][t.target] = str(vals[i])
        # canonical JSON memoized the same way (sorted items are a complete key)
        jcache = self._tag_cache.setdefault("json", {})
        out = np.empty(m, dtype=object)
        for i, d in enumerate(merged):
            try:
                key = tuple(sorted(d.items()))
                s = jcache.get(key)
                if s is None:
                    if len(jcache) > 4096:
                        jcache.clear()
                    s = canonical_json(d)
                    jcache[key] = s
            except TypeError:
                s = canonical_json(d)
            out[i] = s
        return out


def route_stage(
    ds: "ray.data.Dataset",
    rules: list[CompiledRule] | None = None,
    concurrency: int | None = None,
    batch_size: int = 32_768,
) -> "ray.data.Dataset":
    """Apply the ruleset per batch.

    Default is STATELESS tasks (fully elastic under the streaming executor): the
    compiled ruleset is tiny and re-pickles in milliseconds, unlike the enrichment
    stage's lookup tables — so the router gains nothing from actor affinity but
    would pay pool-warmup latency and fixed CPU reservations. Pass ``concurrency``
    to pin an actor pool instead (e.g. for very large rulesets, the reference's
    expression-cache scenario, expression.go:68-82)."""
    if concurrency is not None:
        return ds.map_batches(
            Router,
            fn_constructor_kwargs={"rules": rules},
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=0.75,
            concurrency=concurrency,
        )
    router = Router(rules=rules)
    return ds.map_batches(router, batch_format="pyarrow", batch_size=batch_size)
