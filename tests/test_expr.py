"""Expression-layer tests mirroring the reference's expression semantics
(internal/expression_test.go: typed validation, quoted literals, pick/omit;
mapping_handler_test.go: condition error ⇒ false)."""

import numpy as np
import pytest

from sts_opentelemetry_collector_ray.rules import ExprError, compile_expr


def env_of(**cols):
    n = len(next(iter(cols.values())))
    return {k: np.array(v, dtype=object) for k, v in cols.items()}, n


def test_basic_predicates():
    env, n = env_of(severity=["ERROR", "INFO", "WARN"], tool=["bash", "", "bash"])
    e = compile_expr("severity == 'ERROR'", "bool")
    np.testing.assert_array_equal(e.eval_bool_mask(env, n), [True, False, False])
    e2 = compile_expr("severity in ['WARN', 'ERROR'] and tool != ''", "bool")
    np.testing.assert_array_equal(e2.eval_bool_mask(env, n), [True, False, True])


def test_string_concat_and_string_fn():
    env, n = env_of(conv_id=["c1", "c2"])
    env["turn_idx"] = np.array([3, 4], dtype=object)
    e = compile_expr("'urn:' + conv_id + '/' + string(turn_idx)")
    vals, errs, _ = e.eval_batch(env, n)
    assert list(vals) == ["urn:c1/3", "urn:c2/4"]
    assert not errs.any()


def test_condition_error_is_false():
    # eval error ⇒ false for that row (mapping_handler.go:124-145)
    env, n = env_of(attrs=[{"k": "v"}, None, {"x": "y"}])
    e = compile_expr("attrs['k'] == 'v'", "bool")
    np.testing.assert_array_equal(e.eval_bool_mask(env, n), [True, False, False])


def test_per_row_errors_in_required_exprs():
    env, n = env_of(name=["a", None, "c"])
    e = compile_expr("'x:' + name")
    vals, errs, msg = e.eval_batch(env, n)
    assert list(errs) == [False, True, False]
    assert vals[0] == "x:a" and vals[2] == "x:c"
    assert "concat" in msg or "null" in msg


def test_unquoted_bare_word_is_compile_error():
    # plain strings must be quoted (expression_test.go:553-567)
    e = compile_expr("CREATE")
    with pytest.raises(ExprError):
        e.validate_columns({"severity", "tool"})


def test_disallowed_syntax():
    with pytest.raises(ExprError):
        compile_expr("__import__('os')")
    with pytest.raises(ExprError):
        compile_expr("[x for x in y]")
    with pytest.raises(ExprError):
        compile_expr("lambda: 1")


def test_type_validation_on_literals():
    with pytest.raises(ExprError):
        compile_expr("42", "string")
    with pytest.raises(ExprError):
        compile_expr("'x'", "bool")


def test_pick_omit_functions():
    env, n = env_of(attrs=[{"a": 1, "b": 2}, {"a": 9}])
    vals, errs, _ = compile_expr("omit(attrs, ['b'])").eval_batch(env, n)
    assert vals[0] == {"a": 1} and vals[1] == {"a": 9}
    vals, errs, _ = compile_expr("pick(attrs, ['b'])").eval_batch(env, n)
    assert vals[0] == {"b": 2} and vals[1] == {}


def test_string_functions():
    env, n = env_of(text=["hello world", "call:bash(q1)"])
    assert list(compile_expr("startsWith(text, 'call:')").eval_bool_mask(env, n)) == [False, True]
    assert list(compile_expr("contains(text, 'world')").eval_bool_mask(env, n)) == [True, False]
    assert list(compile_expr("matches(text, 'q[0-9]')").eval_bool_mask(env, n)) == [False, True]


def test_coalesce_and_ternary():
    env, n = env_of(sig=[None, "s1"])
    vals, _, _ = compile_expr("coalesce(sig, 'none')").eval_batch(env, n)
    assert list(vals) == ["none", "s1"]
    vals, _, _ = compile_expr("'yes' if sig == 's1' else 'no'").eval_batch(env, n)
    assert list(vals) == ["no", "yes"]


def test_vars_namespace():
    env, n = env_of(tool=["bash", "curl"])
    env["vars"] = {"cat": np.array(["exec", "net"], dtype=object)}
    vals, errs, _ = compile_expr("'t:' + vars.cat").eval_batch(env, n)
    assert list(vals) == ["t:exec", "t:net"]
    assert not errs.any()


def test_refs_collection():
    e = compile_expr("severity == 'ERROR' and startsWith(tool, 'b')")
    assert e.refs == {"severity", "tool"}


def test_strings_extension():
    # CEL strings extension surface (ext.Strings(), expression.go:176)
    env, n = env_of(text=["  Hello World  ", "a,b,c"])
    vals, _, _ = compile_expr("trim(text)").eval_batch(env, n)
    assert vals[0] == "Hello World"
    vals, _, _ = compile_expr("replace(text, ',', ';')").eval_batch(env, n)
    assert vals[1] == "a;b;c"
    vals, _, _ = compile_expr("split(text, ',')").eval_batch(env, n)
    assert vals[1] == ["a", "b", "c"]
    vals, _, _ = compile_expr("join(split(text, ','), '-')").eval_batch(env, n)
    assert vals[1] == "a-b-c"
    vals, _, _ = compile_expr("substring(text, 2, 7)").eval_batch(env, n)
    assert vals[0] == "Hello"
    vals, _, _ = compile_expr("indexOf(text, 'World')").eval_batch(env, n)
    assert vals[0] == 8 and vals[1] == -1
    vals, _, _ = compile_expr("charAt(text, 0)").eval_batch(env, n)
    assert vals[1] == "a"
    vals, _, _ = compile_expr("lowerAscii(text)").eval_batch(env, n)
    assert vals[0] == "  hello world  "
    # usable inside conditions
    mask = compile_expr("indexOf(text, ',') >= 0", "bool").eval_bool_mask(env, n)
    assert list(mask) == [False, True]


def test_lazy_ternary_with_missing_column_branch():
    """CEL's ternary is lazy: 'x if cond else missing_col' succeeds on rows
    taking the x branch even when missing_col is absent from the env — the
    missing-column short-circuit must not fire for conditional expressions
    (round-3 ADVICE fix)."""
    env, n = env_of(severity=["INFO", "WARN", "INFO"])
    e = compile_expr("'ok' if severity == 'INFO' else missing_col")
    vals, errs, _ = e.eval_batch(env, n)
    assert list(errs) == [False, True, False]
    assert vals[0] == "ok" and vals[2] == "ok"
    # non-conditional missing column still short-circuits every row
    e2 = compile_expr("'p:' + missing_col")
    _, errs2, msg = e2.eval_batch(env, n)
    assert errs2.all() and "missing_col" in msg


def test_var_refs_static_analysis():
    assert compile_expr("'a' + conv_id").var_refs() == set()
    assert compile_expr("vars.sig + vars.other").var_refs() == {"sig", "other"}
    assert compile_expr("vars['sig']").var_refs() == {"sig"}
    assert compile_expr("coalesce(vars.a, 'x')").var_refs() == {"a"}
    # dynamic access defeats analysis -> None (= all vars needed, eval.go:22-24)
    assert compile_expr("vars[conv_id]").var_refs() is None
