"""CEL-lite: the rule expression language, compiled once on the driver.

The reference evaluates CEL expressions (with OptionalTypes, the strings extension and
custom ``pick``/``omit`` functions) per element against typed views of the signal
hierarchy, caching compiled programs in an LRU (reference:
connector/topologyconnector/internal/expression.go:68-82, 173-197, 309-439;
cel_functions.go:35-101). This engine replaces CEL with a deliberately small,
whitelisted Python-syntax expression language ("CEL-lite") compiled ONCE per rule on
the driver; workers receive compiled artifacts — never a per-row compile (the analogue
of the reference's expression cache, which exists only because it compiles lazily).

Key semantics preserved from the reference:

- **Typed output validation at compile time**: string/bool-typed wrappers reject
  expressions whose syntax can't produce that type where detectable
  (expression.go:369-439); full type errors surface at eval as per-row errors.
- **Error model** (mapping_handler.go:124-145, mapping.go:348-359): a condition that
  errors evaluates to *false* for that row; a *required* output expression that errors
  produces an error row; an *optional* one yields null silently. Vectorized evaluation
  is attempted first; on failure the batch falls back to per-row evaluation so errors
  stay per-row, exactly like the reference's per-element loop.
- **Unquoted bare words are compile errors** (expression_test.go:553-567): an
  expression that is a lone identifier not naming a known column/namespace raises at
  compile when `known_columns` is provided.

Vectorized evaluation: the AST is interpreted directly over numpy object arrays (one
env entry per referenced column), using numpy/pandas kernels for comparisons, boolean
algebra, membership, concatenation and the function library. The same interpreter runs
on scalar environments for the per-row fallback.
"""

from __future__ import annotations

import ast
import json
import re
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd

from ..functions.maps import omit, pick


class ExprError(Exception):
    """Compile-time expression error (unknown syntax, unknown function, bare word)."""


class _EvalError(Exception):
    """Internal: evaluation failure (null access, type mismatch, missing column)."""


_ALLOWED_NODES = (
    ast.Expression, ast.BoolOp, ast.And, ast.Or, ast.UnaryOp, ast.Not, ast.USub,
    ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Mod, ast.Div,
    ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.In, ast.NotIn, ast.Name, ast.Load, ast.Constant, ast.Attribute,
    ast.Subscript, ast.Call, ast.IfExp, ast.List, ast.Tuple,
)

_FUNCTIONS = frozenset(
    {
        "matches", "startsWith", "endsWith", "contains", "lower", "upper",
        "string", "int", "float", "size", "coalesce", "pick", "omit", "has",
        # CEL strings extension surface (expression.go:176 ext.Strings()):
        "trim", "replace", "split", "substring", "indexOf", "charAt",
        "lowerAscii", "upperAscii", "join",
    }
)


def _is_vec(x) -> bool:
    return isinstance(x, (np.ndarray, pd.Series))


def _as_series(x, n: int) -> pd.Series:
    if isinstance(x, pd.Series):
        return x
    if isinstance(x, np.ndarray):
        return pd.Series(x)
    return pd.Series([x] * n, dtype=object)


def _str_series(x, n: int) -> pd.Series:
    return _as_series(x, n).astype("object")


class _Interp:
    """AST interpreter over an env of numpy arrays / pandas Series (vectorized) or
    python scalars (row fallback). `n` is the batch length (1 in scalar mode)."""

    def __init__(self, env: dict[str, Any], n: int, scalar: bool):
        self.env = env
        self.n = n
        self.scalar = scalar

    def eval(self, node):  # noqa: C901 - a small interpreter is one function family
        if isinstance(node, ast.Expression):
            return self.eval(node.body)
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, (ast.List, ast.Tuple)):
            return [self.eval(e) for e in node.elts]
        if isinstance(node, ast.Name):
            if node.id not in self.env:
                raise _EvalError(f"unknown identifier: {node.id}")
            return self.env[node.id]
        if isinstance(node, ast.Attribute):
            base = self.eval(node.value)
            return self._index(base, node.attr)
        if isinstance(node, ast.Subscript):
            base = self.eval(node.value)
            key = self.eval(node.slice)
            return self._index(base, key)
        if isinstance(node, ast.BoolOp):
            vals = [self.eval(v) for v in node.values]
            if self.scalar:
                if isinstance(node.op, ast.And):
                    out = True
                    for v in vals:
                        out = out and bool(v)
                    return out
                out = False
                for v in vals:
                    out = out or bool(v)
                return out
            acc = self._as_bool(vals[0])
            for v in vals[1:]:
                b = self._as_bool(v)
                acc = (acc & b) if isinstance(node.op, ast.And) else (acc | b)
            return acc
        if isinstance(node, ast.UnaryOp):
            v = self.eval(node.operand)
            if isinstance(node.op, ast.Not):
                return (not v) if self.scalar else ~self._as_bool(v)
            return -v
        if isinstance(node, ast.BinOp):
            left, right = self.eval(node.left), self.eval(node.right)
            return self._binop(node.op, left, right)
        if isinstance(node, ast.Compare):
            left = self.eval(node.left)
            result = None
            for op, comp in zip(node.ops, node.comparators):
                right = self.eval(comp)
                r = self._compare(op, left, right)
                result = r if result is None else (
                    (result and r) if self.scalar else (self._as_bool(result) & self._as_bool(r))
                )
                left = right
            return result
        if isinstance(node, ast.IfExp):
            test = self.eval(node.test)
            if self.scalar:
                return self.eval(node.body) if test else self.eval(node.orelse)
            t = self._as_bool(test)
            body = _as_series(self.eval(node.body), self.n)
            other = _as_series(self.eval(node.orelse), self.n)
            return body.where(pd.Series(np.asarray(t)), other)
        if isinstance(node, ast.Call):
            fname = node.func.id if isinstance(node.func, ast.Name) else None
            args = [self.eval(a) for a in node.args]
            return self._call(fname, args, node)
        raise _EvalError(f"unsupported node {type(node).__name__}")

    # -- helpers -----------------------------------------------------------
    def _as_bool(self, v):
        if self.scalar:
            return bool(v)
        s = _as_series(v, self.n)
        return s.fillna(False).astype(bool).to_numpy()

    def _index(self, base, key):
        if base is None:
            raise _EvalError("null access")
        if isinstance(base, dict):
            # namespace (e.g. `vars`) in vectorized mode / map value in scalar mode
            if key not in base:
                raise _EvalError(f"no such key: {key}")
            return base[key]
        if self.scalar:
            raise _EvalError(f"cannot index {type(base).__name__}")
        s = _as_series(base, self.n)

        def get(d):
            if d is None or not isinstance(d, dict) or key not in d:
                raise _EvalError(f"no such key: {key}")
            return d[key]

        return s.map(get)

    def _binop(self, op, left, right):
        if isinstance(op, ast.Add):
            if self.scalar:
                if isinstance(left, str) or isinstance(right, str):
                    if left is None or right is None:
                        raise _EvalError("null in concat")
                    return str(left) + str(right)
                return left + right
            lv, rv = _is_vec(left), _is_vec(right)
            l_is_str = (isinstance(left, str)) or (lv and _as_series(left, self.n).map(lambda x: isinstance(x, str)).any())
            r_is_str = (isinstance(right, str)) or (rv and _as_series(right, self.n).map(lambda x: isinstance(x, str)).any())
            if l_is_str or r_is_str:
                ls = _str_series(left, self.n).map(lambda x: x if isinstance(x, str) else (str(x) if x is not None else None))
                rs = _str_series(right, self.n).map(lambda x: x if isinstance(x, str) else (str(x) if x is not None else None))
                if ls.isna().any() or rs.isna().any():
                    raise _EvalError("null in concat")
                return (ls + rs).to_numpy(dtype=object)
            return _as_series(left, self.n) + _as_series(right, self.n)
        if isinstance(op, ast.Sub):
            return left - right if self.scalar else _as_series(left, self.n) - _as_series(right, self.n)
        if isinstance(op, ast.Mult):
            return left * right if self.scalar else _as_series(left, self.n) * _as_series(right, self.n)
        if isinstance(op, ast.Div):
            return left / right if self.scalar else _as_series(left, self.n) / _as_series(right, self.n)
        if isinstance(op, ast.Mod):
            return left % right if self.scalar else _as_series(left, self.n) % _as_series(right, self.n)
        raise _EvalError("unsupported operator")

    def _compare(self, op, left, right):
        if self.scalar:
            if isinstance(op, ast.Eq):
                return left == right
            if isinstance(op, ast.NotEq):
                return left != right
            if isinstance(op, ast.In):
                return left in right
            if isinstance(op, ast.NotIn):
                return left not in right
            if left is None or right is None:
                raise _EvalError("null comparison")
            if isinstance(op, ast.Lt):
                return left < right
            if isinstance(op, ast.LtE):
                return left <= right
            if isinstance(op, ast.Gt):
                return left > right
            return left >= right
        ls = _as_series(left, self.n)
        if isinstance(op, (ast.In, ast.NotIn)):
            items = list(right)
            if any(_is_vec(e) for e in items):
                # membership against COLUMN elements (e.g. tool in [tool_name,
                # 'bash']): elementwise equality per candidate, with the row
                # interpreter's null-identity semantics (None in [None] → True)
                acc = np.zeros(self.n, dtype=bool)
                for e in items:
                    es = _as_series(e, self.n)
                    acc |= (ls == es).to_numpy() | (ls.isna() & es.isna()).to_numpy()
                return acc if isinstance(op, ast.In) else ~acc
            hit = ls.isin(items).to_numpy()
            return hit if isinstance(op, ast.In) else ~hit
        rs = _as_series(right, self.n)
        if isinstance(op, ast.Eq):
            # null == null is TRUE (CEL semantics; the row interpreter's Python
            # `None == None` agrees) — pandas alone would yield False
            both_na = (ls.isna() & rs.isna()).to_numpy()
            return (ls == rs).to_numpy() | both_na
        if isinstance(op, ast.NotEq):
            both_na = (ls.isna() & rs.isna()).to_numpy()
            return (ls != rs).to_numpy() & ~both_na
        if isinstance(op, ast.Lt):
            return (ls < rs).to_numpy()
        if isinstance(op, ast.LtE):
            return (ls <= rs).to_numpy()
        if isinstance(op, ast.Gt):
            return (ls > rs).to_numpy()
        return (ls >= rs).to_numpy()

    def _call(self, fname, args, node):
        if fname not in _FUNCTIONS:
            raise _EvalError(f"unknown function: {fname}")
        if fname == "matches":
            pat = re.compile(args[1])
            if self.scalar:
                if args[0] is None:
                    raise _EvalError("null matches")
                return pat.search(args[0]) is not None
            return _str_series(args[0], self.n).str.contains(pat, regex=True, na=False).to_numpy()
        if fname in ("startsWith", "endsWith", "contains"):
            if self.scalar:
                if args[0] is None:
                    raise _EvalError("null string op")
                return {
                    "startsWith": args[0].startswith(args[1]),
                    "endsWith": args[0].endswith(args[1]),
                    "contains": args[1] in args[0],
                }[fname]
            s = _str_series(args[0], self.n)
            if fname == "startsWith":
                return s.str.startswith(args[1], na=False).to_numpy()
            if fname == "endsWith":
                return s.str.endswith(args[1], na=False).to_numpy()
            return s.str.contains(args[1], regex=False, na=False).to_numpy()
        if fname in ("lower", "upper"):
            if self.scalar:
                return args[0].lower() if fname == "lower" else args[0].upper()
            s = _str_series(args[0], self.n)
            return (s.str.lower() if fname == "lower" else s.str.upper()).to_numpy(dtype=object)
        if fname == "string":
            if self.scalar:
                if args[0] is None:
                    raise _EvalError("string(null)")
                if isinstance(args[0], bool):
                    return "true" if args[0] else "false"
                if isinstance(args[0], float) and args[0] == int(args[0]):
                    return str(args[0])
                return str(args[0])
            s = _as_series(args[0], self.n)
            if s.isna().any():
                raise _EvalError("string(null)")
            return s.map(lambda x: ("true" if x else "false") if isinstance(x, bool) else str(x)).to_numpy(dtype=object)
        if fname == "int":
            if self.scalar:
                return int(args[0])
            return _as_series(args[0], self.n).map(int)
        if fname == "float":
            return float(args[0]) if self.scalar else _as_series(args[0], self.n).map(float)
        if fname == "size":
            if self.scalar:
                return len(args[0])
            return _as_series(args[0], self.n).map(len)
        if fname == "coalesce":
            if self.scalar:
                for a in args:
                    if a is not None:
                        return a
                return None
            out = _as_series(args[0], self.n)
            for a in args[1:]:
                out = out.where(out.notna(), _as_series(a, self.n))
            return out.to_numpy(dtype=object)
        if fname == "has":
            # has(attrs, 'k') — safe membership probe (CEL's has() macro analogue)
            if self.scalar:
                return isinstance(args[0], dict) and args[1] in args[0]
            return _as_series(args[0], self.n).map(
                lambda d: isinstance(d, dict) and args[1] in d
            ).to_numpy()
        if fname == "trim":
            if self.scalar:
                return args[0].strip()
            return _str_series(args[0], self.n).str.strip().to_numpy(dtype=object)
        if fname == "replace":
            if self.scalar:
                return args[0].replace(args[1], args[2])
            return (
                _str_series(args[0], self.n)
                .str.replace(args[1], args[2], regex=False)
                .to_numpy(dtype=object)
            )
        if fname == "split":
            if self.scalar:
                return args[0].split(args[1])
            return _str_series(args[0], self.n).str.split(args[1]).to_numpy(dtype=object)
        if fname == "join":
            sep = args[1] if len(args) > 1 else ""
            if self.scalar:
                return sep.join(args[0])
            return (
                _as_series(args[0], self.n)
                .map(lambda xs: sep.join(xs))
                .to_numpy(dtype=object)
            )
        if fname == "substring":
            start = args[1]
            end = args[2] if len(args) > 2 else None
            if self.scalar:
                return args[0][start:end]
            return (
                _str_series(args[0], self.n).str.slice(start, end).to_numpy(dtype=object)
            )
        if fname == "indexOf":
            if self.scalar:
                return args[0].find(args[1])
            return _str_series(args[0], self.n).str.find(args[1]).to_numpy()
        if fname == "charAt":
            if self.scalar:
                return args[0][args[1]] if args[1] < len(args[0]) else ""
            return (
                _str_series(args[0], self.n)
                .str.slice(args[1], args[1] + 1)
                .to_numpy(dtype=object)
            )
        if fname in ("lowerAscii", "upperAscii"):
            if self.scalar:
                return args[0].lower() if fname == "lowerAscii" else args[0].upper()
            s = _str_series(args[0], self.n)
            return (s.str.lower() if fname == "lowerAscii" else s.str.upper()).to_numpy(dtype=object)
        if fname in ("pick", "omit"):
            fn = pick if fname == "pick" else omit
            if self.scalar:
                if not isinstance(args[0], dict):
                    raise _EvalError(f"{fname} on non-map")
                return fn(args[0], args[1])
            return _as_series(args[0], self.n).map(
                lambda d: fn(d, args[1]) if isinstance(d, dict) else _raise(_EvalError(f"{fname} on non-map"))
            ).to_numpy(dtype=object)
        raise _EvalError(f"unhandled function {fname}")


def _raise(e):
    raise e


def _collect_refs(tree: ast.AST) -> set[str]:
    refs: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and not (
            isinstance(getattr(node, "parent", None), ast.Call)
        ):
            refs.add(node.id)
    return refs


@dataclass
class CompiledExpr:
    """A rule expression compiled once on the driver; pickles to workers cheaply.

    `eval_batch(env, n)` returns ``(values, error_mask, error_msgs)`` — vectorized
    fast path with per-row fallback on failure, preserving the reference's
    per-element error semantics (mapping_handler.go:124-145).
    """

    source: str
    expected: str = "any"  # any | string | bool
    refs: set[str] = field(default_factory=set)

    def __post_init__(self):
        try:
            tree = ast.parse(self.source, mode="eval")
        except SyntaxError as e:
            raise ExprError(f"syntax error in expression {self.source!r}: {e}") from e
        self._concat_plan = _try_concat_plan(tree)
        self._bool_plan = _try_bool_plan(tree) if self.expected == "bool" else None
        for node in ast.walk(tree):
            if not isinstance(node, _ALLOWED_NODES):
                raise ExprError(
                    f"disallowed syntax {type(node).__name__} in {self.source!r}"
                )
            if isinstance(node, ast.Call) and (
                not isinstance(node.func, ast.Name) or node.func.id not in _FUNCTIONS
            ):
                raise ExprError(f"unknown function in {self.source!r}")
        self._tree = tree
        # Lazy-ternary flag: 'x if cond else missing_col' can still succeed
        # per-row on the x branch, so the missing-column short-circuit in
        # eval_batch is only sound when the AST has no conditional.
        self._has_ifexp = any(isinstance(n, ast.IfExp) for n in ast.walk(tree))
        self.refs = {
            n.id
            for n in ast.walk(tree)
            if isinstance(n, ast.Name)
        } - _FUNCTIONS
        if self.expected == "bool" and isinstance(tree.body, ast.Constant):
            if not isinstance(tree.body.value, bool):
                raise ExprError(f"expression {self.source!r} is not boolean")
        if self.expected == "string" and isinstance(tree.body, ast.Constant):
            if not isinstance(tree.body.value, str):
                raise ExprError(f"expression {self.source!r} is not a string")

    def var_refs(self) -> "set[str] | None":
        """Names of vars this expression references as ``vars.name`` /
        ``vars['name']`` — the engine's CollectVarReferences (eval.go:15-32).
        Returns None when a dynamic access defeats static analysis (callers
        fall back to "all vars needed", like the reference's nil result)."""
        if "vars" not in self.refs:
            return set()
        names: set[str] = set()
        dynamic = False
        for node in ast.walk(self._tree):
            if isinstance(node, ast.Attribute) and (
                isinstance(node.value, ast.Name) and node.value.id == "vars"
            ):
                names.add(node.attr)
            elif isinstance(node, ast.Subscript) and (
                isinstance(node.value, ast.Name) and node.value.id == "vars"
            ):
                if isinstance(node.slice, ast.Constant) and isinstance(
                    node.slice.value, str
                ):
                    names.add(node.slice.value)
                else:
                    dynamic = True
            elif isinstance(node, ast.Name) and node.id == "vars":
                # bare `vars` passed to a function etc. — any var may be read
                parent_handled = False
                for p in ast.walk(self._tree):
                    if (
                        isinstance(p, (ast.Attribute, ast.Subscript))
                        and p.value is node
                    ):
                        parent_handled = True
                        break
                if not parent_handled:
                    dynamic = True
        return None if dynamic else names

    def validate_columns(self, known: set[str]) -> None:
        """Bare-word check (expression_test.go:553-567): every referenced name must be
        a known column or namespace — a lone unquoted word is a compile error."""
        unknown = self.refs - known - {"vars"}
        if unknown:
            raise ExprError(
                f"unknown identifier(s) {sorted(unknown)} in {self.source!r} — "
                "string literals must be quoted"
            )

    def __getstate__(self):
        return {"source": self.source, "expected": self.expected}

    def __setstate__(self, state):
        self.source = state["source"]
        self.expected = state["expected"]
        self.__post_init__()

    # -- evaluation --------------------------------------------------------
    def eval_batch(self, env: dict[str, Any], n: int):
        """Vectorized evaluate; returns (values: np.ndarray[object] | ndarray,
        err_mask: np.ndarray[bool], err_msg: str | None)."""
        if self._concat_plan is not None:
            out = _eval_concat(self._concat_plan, env, n)
            if out is not None:
                return out
        try:
            out = _Interp(env, n, scalar=False).eval(self._tree)
            if _is_vec(out):
                arr = np.asarray(_as_series(out, n).to_numpy(dtype=object))
            else:
                arr = np.full(n, out, dtype=object)
            return arr, np.zeros(n, dtype=bool), None
        except Exception:
            # a referenced column absent from the env fails EVERY row identically —
            # short-circuit instead of the per-row fallback loop. NOT sound for
            # conditionals: CEL's lazy ternary lets rows on the taken branch
            # succeed even when the other branch references a missing column.
            missing = [
                c for c in self.refs if c != "vars" and c not in env
            ]
            if missing and not self._has_ifexp:
                return (
                    np.full(n, None, dtype=object),
                    np.ones(n, dtype=bool),
                    f"KeyError: {missing[0]!r}",
                )
            return self._eval_rows(env, n)

    def _eval_rows(self, env: dict[str, Any], n: int):
        values = np.full(n, None, dtype=object)
        errs = np.zeros(n, dtype=bool)
        msg = None
        for i in range(n):
            row_env = {
                k: (v[i] if _is_vec(v) else v) if not isinstance(v, dict) else v
                for k, v in env.items()
            }
            if "vars" in env and isinstance(env["vars"], dict):
                row_env["vars"] = {
                    k: (v[i] if _is_vec(v) else v) for k, v in env["vars"].items()
                }
            try:
                values[i] = _Interp(row_env, 1, scalar=True).eval(self._tree)
            except Exception as e:  # per-row error — reference: skip / error row
                errs[i] = True
                if msg is None:
                    msg = f"{type(e).__name__}: {e}"
        return values, errs, msg

    def eval_bool_mask(self, env: dict[str, Any], n: int) -> np.ndarray:
        """Condition semantics: eval error ⇒ false (mapping_handler.go:124-145)."""
        values, errs, _ = self.eval_batch(env, n)
        out = np.zeros(n, dtype=bool)
        ok = ~errs
        out[ok] = np.array([bool(v) for v in values[ok]], dtype=bool)
        return out

    def eval_bool_mask_table(self, batch, n: int) -> "np.ndarray | None":
        """Arrow-native condition path: simple predicate shapes (col ==/!= lit,
        col in [lits], and/or/not combinations) compile to pyarrow.compute
        kernels over the batch's ORIGINAL Arrow columns — no numpy object
        materialization. Returns None when the expression has no Arrow plan or
        a referenced column is absent from the batch (caller falls back to the
        generic path). Null semantics match the numpy path: null == lit → false,
        null != lit → true, null in [..] → false."""
        import os as _os

        # GRAFT_NO_ARROW_COND=1 forces the generic interpreter (A/B debug knob)
        if self._bool_plan is None or _os.environ.get("GRAFT_NO_ARROW_COND"):
            return None
        try:
            arr = _eval_bool_plan(self._bool_plan, batch)
        except Exception:  # missing column / type mismatch → generic path
            return None
        return np.asarray(arr.to_numpy(zero_copy_only=False))


def _try_bool_plan(tree: ast.Expression):
    """Compile-time detection of simple boolean predicates — ``col == 'lit'``,
    ``col != 'lit'``, ``col in ['a', 'b']`` and and/or/not combinations (the
    shape of every routing condition). These evaluate via pyarrow.compute
    kernels on the batch's original Arrow columns (`eval_bool_mask_table`),
    skipping numpy object materialization entirely."""

    def walk(node):
        if isinstance(node, ast.BoolOp):
            parts = [walk(v) for v in node.values]
            if any(p is None for p in parts):
                return None
            return ("and" if isinstance(node.op, ast.And) else "or", parts)
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            sub = walk(node.operand)
            return ("not", sub) if sub is not None else None
        if (
            isinstance(node, ast.Compare)
            and len(node.ops) == 1
            and isinstance(node.left, ast.Name)
        ):
            op, cmp_ = node.ops[0], node.comparators[0]
            if isinstance(op, (ast.Eq, ast.NotEq)) and isinstance(cmp_, ast.Constant):
                if isinstance(cmp_.value, (str, int, float, bool)):
                    kind = "eq" if isinstance(op, ast.Eq) else "ne"
                    return (kind, node.left.id, cmp_.value)
            if isinstance(op, (ast.In, ast.NotIn)) and isinstance(
                cmp_, (ast.List, ast.Tuple)
            ):
                vals = []
                for el in cmp_.elts:
                    if not (
                        isinstance(el, ast.Constant)
                        and isinstance(el.value, (str, int, float, bool))
                    ):
                        return None
                    vals.append(el.value)
                if len({type(v) for v in vals}) > 1:
                    return None
                kind = "in" if isinstance(op, ast.In) else "notin"
                return (kind, node.left.id, vals)
        return None

    return walk(tree.body)


def _eval_bool_plan(plan, batch):
    """Evaluate a bool plan against a pyarrow Table; returns a non-null
    BooleanArray with the numpy path's null semantics baked into each leaf."""
    import pyarrow as pa
    import pyarrow.compute as pc

    kind = plan[0]
    if kind in ("and", "or"):
        parts = [_eval_bool_plan(p, batch) for p in plan[1]]
        acc = parts[0]
        for p in parts[1:]:
            acc = pc.and_(acc, p) if kind == "and" else pc.or_(acc, p)
        return acc
    if kind == "not":
        return pc.invert(_eval_bool_plan(plan[1], batch))
    _, col, val = plan
    c = batch[col]  # KeyError when absent → caller falls back
    if kind == "eq":
        return pc.fill_null(pc.equal(c, pa.scalar(val)), False)
    if kind == "ne":
        return pc.fill_null(pc.not_equal(c, pa.scalar(val)), True)
    arr = pc.fill_null(pc.is_in(c, value_set=pa.array(val)), False)
    return arr if kind == "in" else pc.invert(arr)


def _try_concat_plan(tree: ast.Expression):
    """Compile-time detection of pure string-concat expressions —
    ``'lit' + col + string(col) + vars.x`` chains (the shape of every identifier /
    URN expression). These evaluate via ONE Arrow ``binary_join_element_wise``
    kernel instead of the generic interpreter (≈16× faster than numpy char ops)."""
    parts: list[ast.AST] = []

    def walk(node):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            walk(node.left)
            walk(node.right)
        else:
            parts.append(node)

    walk(tree.body)
    if len(parts) < 2:
        return None
    plan: list[tuple[str, str]] = []
    for p in parts:
        if isinstance(p, ast.Constant) and isinstance(p.value, str):
            plan.append(("lit", p.value))
        elif isinstance(p, ast.Name):
            plan.append(("col", p.id))
        elif (
            isinstance(p, ast.Attribute)
            and isinstance(p.value, ast.Name)
            and p.value.id == "vars"
        ):
            plan.append(("var", p.attr))
        elif (
            isinstance(p, ast.Call)
            and isinstance(p.func, ast.Name)
            and p.func.id == "string"
            and len(p.args) == 1
        ):
            a = p.args[0]
            if isinstance(a, ast.Name):
                plan.append(("col", a.id))
            elif (
                isinstance(a, ast.Attribute)
                and isinstance(a.value, ast.Name)
                and a.value.id == "vars"
            ):
                plan.append(("var", a.attr))
            else:
                return None
        else:
            return None
    if all(k == "lit" for k, _ in plan):
        return None
    return plan


def _eval_concat(plan, env: dict[str, Any], n: int):
    """Arrow fast path for concat plans; returns (values, errs, msg) or None to
    fall back (missing column, unexpected type)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    args = []
    try:
        for kind, v in plan:
            if kind == "lit":
                args.append(v)
                continue
            if kind == "var":
                vars_ns = env.get("vars")
                if not isinstance(vars_ns, dict) or v not in vars_ns:
                    return None
                val = vars_ns[v]
            else:
                if v not in env:
                    return None
                val = env[v]
            if isinstance(val, pd.Series):
                val = val.to_numpy()
            if not isinstance(val, np.ndarray):
                return None
            arr = pa.array(val)
            if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
                arr = pc.cast(arr, pa.string())
            args.append(arr)
        joined = pc.binary_join_element_wise(*args, "")
    except Exception:
        return None
    errs = np.asarray(pc.is_null(joined).to_numpy(zero_copy_only=False))
    values = np.asarray(joined.to_numpy(zero_copy_only=False), dtype=object)
    msg = "null in concat" if errs.any() else None
    return values, errs, msg


def compile_expr(source: str, expected: str = "any") -> CompiledExpr:
    return CompiledExpr(source=source, expected=expected)


def canonical_json(obj) -> str:
    """Deterministic JSON (sorted keys, no spaces) — the engine's analogue of the
    reference's canonical protobuf-Struct encoding for config/status payloads and of
    the sorted-key dedup encoding (deduplicator.go:332-392)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), default=str)
