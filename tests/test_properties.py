"""Property-based tests (hypothesis): the vectorized kernels must agree with their
scalar definitions on arbitrary inputs, and the expression fast paths must agree
with the generic interpreter."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sts_opentelemetry_collector_ray.functions.hashing import (
    fnv1a32,
    fnv1a32_array,
    fnv1a64,
    fnv1a64_array,
)
from sts_opentelemetry_collector_ray.rules.expr import compile_expr

# NUL-free text (the byte-matrix kernel uses NUL padding internally)
texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0x2FFF),
        max_size=40,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_fnv_vectorized_equals_scalar(vals):
    np.testing.assert_array_equal(
        fnv1a32_array(vals), np.array([fnv1a32(v) for v in vals], dtype=np.uint64)
    )
    np.testing.assert_array_equal(
        fnv1a64_array(vals), np.array([fnv1a64(v) for v in vals], dtype=np.uint64)
    )


@settings(max_examples=60, deadline=None)
@given(texts)
def test_fnv_arrow_equals_scalar(vals):
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.functions.hashing import (
        fnv1a32_arrow,
        fnv1a64_arrow,
    )

    arr = pa.array(vals, pa.string())
    np.testing.assert_array_equal(
        fnv1a32_arrow(arr), np.array([fnv1a32(v) for v in vals], dtype=np.uint64)
    )
    np.testing.assert_array_equal(
        fnv1a64_arrow(arr), np.array([fnv1a64(v) for v in vals], dtype=np.uint64)
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="abcXYZ 0123", max_size=12)),
        min_size=1,
        max_size=30,
    ),
    st.lists(st.integers(min_value=-1000, max_value=10**9), min_size=1, max_size=30),
)
def test_concat_fast_path_equals_interpreter(strs, ints):
    """The Arrow concat plan must yield exactly what the generic (row-fallback)
    interpreter yields: same values AND same per-row error mask."""
    n = min(len(strs), len(ints))
    env = {
        "s": np.array(strs[:n], dtype=object),
        "i": np.array(ints[:n], dtype=object),
    }
    fast = compile_expr("'p:' + s + '/' + string(i)")
    assert fast._concat_plan is not None
    vf, ef, _ = fast.eval_batch(env, n)
    slow_vals, slow_errs, _ = fast._eval_rows(env, n)
    np.testing.assert_array_equal(ef, slow_errs)
    for a, b, err in zip(vf, slow_vals, ef):
        if not err:
            assert a == b


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(st.text(alphabet="abc.", min_size=1, max_size=8),
                       st.text(max_size=8), max_size=6),
       st.lists(st.text(alphabet="abc.", min_size=1, max_size=8), max_size=4))
def test_pick_omit_partition(m, keys):
    from sts_opentelemetry_collector_ray.functions.maps import omit, pick

    p, o = pick(m, keys), omit(m, keys)
    assert set(p) | set(o) == set(m)
    assert not (set(p) & set(o))
    merged = {**p, **o}
    assert merged == m


# ---------------------------------------------------------------------------
# Round-2 vectorized kernels vs naive reference implementations
# ---------------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab cé!", max_size=40), min_size=1, max_size=12))
def test_simhash_vectorized_equals_naive(texts):
    """unpackbits/reduceat SimHash must match the per-row bit-vote definition."""
    import pandas as pd

    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a64_array
    from sts_opentelemetry_collector_ray.stages.dedup_docs import simhash_batch

    got = simhash_batch(pd.DataFrame({"text": texts}))["simhash"].to_numpy(dtype=np.uint64)
    for i, txt in enumerate(texts):
        toks = str(txt).lower().split()
        if not toks:
            assert got[i] == 0
            continue
        hv = fnv1a64_array(toks)
        sh = np.uint64(0)
        for bit in range(64):
            ones = int(((hv >> np.uint64(bit)) & np.uint64(1)).sum())
            if ones * 2 - len(hv) > 0:
                sh |= np.uint64(1) << np.uint64(bit)
        assert got[i] == sh


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abcd e", max_size=30), min_size=1, max_size=10))
def test_minhash_signatures_vectorized_equals_per_doc(texts):
    """reduceat whole-batch minhash must equal the per-doc matrix path."""
    from sts_opentelemetry_collector_ray.stages.dedup_docs import (
        _minhash, _minhash_signatures, _perm_params, _shingles,
    )

    a, b = _perm_params(16)
    got = _minhash_signatures(np.array(texts, dtype=object), a, b, shingle_k=5,
                              max_chunk_shingles=7)  # force multi-chunk path
    for i, t in enumerate(texts):
        exp = _minhash(_shingles(t, 5), a, b)
        np.testing.assert_array_equal(got[i], exp)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=" ax\t", max_size=20), min_size=1, max_size=10))
def test_token_count_vectorized_equals_python(texts):
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.stages.text_analysis import token_count_batch

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = token_count_batch(t)["n_tokens"].to_pylist()
    exp = [len([w for w in s.split() if w]) for s in texts]
    assert got == exp


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), st.sampled_from(["A", "B", "ERROR", ""])),
                min_size=1, max_size=30),
       st.lists(st.one_of(st.none(), st.sampled_from(["x", "y", ""])),
                min_size=1, max_size=30))
def test_arrow_bool_plan_matches_numpy_path(sev, tool):
    """The pyarrow-kernel condition path must agree with the numpy interpreter
    on every simple predicate shape, including null handling."""
    import pyarrow as pa

    n = min(len(sev), len(tool))
    batch = pa.table(
        {"severity": pa.array(sev[:n], pa.string()), "tool": pa.array(tool[:n], pa.string())}
    )
    env = {
        "severity": np.array(sev[:n], dtype=object),
        "tool": np.array(tool[:n], dtype=object),
    }
    exprs = [
        "severity == 'ERROR'",
        "tool != ''",
        "severity in ['A', 'B']",
        "severity not in ['A', 'B']",
        "not (severity == 'A')",
        "severity == 'A' and tool != 'x'",
        "severity != 'A' or tool == 'y'",
        "severity == 'ERROR' and tool in ['x', 'y']",
    ]
    for src in exprs:
        c = compile_expr(src, "bool")
        assert c._bool_plan is not None, src
        fast = c.eval_bool_mask_table(batch, n)
        slow = c.eval_bool_mask(env, n)
        np.testing.assert_array_equal(fast, slow, err_msg=src)


def _random_expr(rng, depth=0):
    """Random CEL-lite expression over columns s1,s2 (str), i1 (int)."""
    leaves = ["s1", "s2", "i1", "'lit'", "'x'", "7", "0", "''"]
    if depth >= 2 or rng.random() < 0.35:
        return leaves[rng.integers(0, len(leaves))]
    kind = rng.integers(0, 8)
    a = _random_expr(rng, depth + 1)
    b = _random_expr(rng, depth + 1)
    if kind == 0:
        return f"({a}) == ({b})"
    if kind == 1:
        return f"({a}) != ({b})"
    if kind == 2:
        return f"({a}) if ({_random_expr(rng, depth + 1)}) == ({a}) else ({b})"
    if kind == 3:
        return f"coalesce({a}, {b})"
    if kind == 4:
        return f"lower(string({a}))"
    if kind == 5:
        return f"({a}) in [{a}, {b}]"
    if kind == 6 and rng.random() < 0.5:
        return f"(i1) < ({rng.integers(0, 9)})"
    if kind == 6:
        return f"(i1) + ({rng.integers(0, 9)})"
    return f"string({a}) + string({b})"


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 12))
def test_vectorized_expr_matches_row_interpreter(seed, n):
    """The vectorized interpreter and the per-row fallback must agree on values
    AND per-row error masks for random expressions over mixed data with nulls."""
    rng = np.random.default_rng(seed)
    env = {
        "s1": np.array(
            [None if rng.random() < 0.2 else rng.choice(["lit", "x", "", "abc"]) for _ in range(n)],
            dtype=object,
        ),
        "s2": np.array(
            [None if rng.random() < 0.2 else rng.choice(["x", "y"]) for _ in range(n)],
            dtype=object,
        ),
        "i1": np.array([int(v) for v in rng.integers(0, 9, n)], dtype=object),
    }
    src = _random_expr(rng)
    try:
        c = compile_expr(src, "any")
    except Exception:
        return  # grammar produced something the compiler rejects — fine
    fast_vals, fast_errs, _ = c.eval_batch(dict(env), n)
    slow_vals, slow_errs, _ = c._eval_rows(dict(env), n)
    np.testing.assert_array_equal(fast_errs, slow_errs, err_msg=src)
    for i in range(n):
        if not fast_errs[i]:
            assert str(fast_vals[i]) == str(slow_vals[i]), (src, i, fast_vals[i], slow_vals[i])
