"""Unit tests for the scalar function library (SURVEY.md §2.8, M9, M12, M18)."""

import numpy as np
import pytest

from sts_opentelemetry_collector_ray.functions import (
    UrnTemplate,
    fnv1a32,
    fnv1a32_array,
    fnv1a64,
    fnv1a64_array,
    omit,
    pick,
    shard_id_array,
)


def test_fnv1a32_known_vectors():
    # Classic FNV-1a test vectors
    assert fnv1a32("") == 2166136261
    assert fnv1a32("a") == 0xE40C292C
    assert fnv1a32("foobar") == 0xBF9CF968


def test_fnv1a64_known_vectors():
    assert fnv1a64("") == 14695981039346656037
    assert fnv1a64("a") == 0xAF63DC4C8601EC8C
    assert fnv1a64("foobar") == 0x85944171F73967E8


def test_vectorized_matches_scalar():
    vals = ["", "a", "foobar", "urn:conv/conv-00000012:turn/3", "x" * 100]
    np.testing.assert_array_equal(
        fnv1a32_array(vals), np.array([fnv1a32(v) for v in vals], dtype=np.uint64)
    )
    np.testing.assert_array_equal(
        fnv1a64_array(vals), np.array([fnv1a64(v) for v in vals], dtype=np.uint64)
    )


def test_shard_id_range():
    shards = shard_id_array([f"urn:x/{i}" for i in range(100)])
    assert shards.min() >= 0 and shards.max() <= 3
    assert len(set(shards.tolist())) == 4  # all shards hit


def test_pick_omit():
    m = {"a": 1, "b": 2, "c": 3}
    assert pick(m, ["a", "c", "zz"]) == {"a": 1, "c": 3}
    assert omit(m, ["a"]) == {"b": 2, "c": 3}
    assert omit(m, []) == m


def test_urn_template():
    t = UrnTemplate("urn:kubernetes:/${cluster}:${ns}/pod/${pod}")
    assert t.variables == ["cluster", "ns", "pod"]
    assert (
        t.expand_row({"cluster": "c1", "ns": "default", "pod": "p0"})
        == "urn:kubernetes:/c1:default/pod/p0"
    )
    # missing tag ⇒ template skipped (identifier.go:60-77)
    assert t.expand_row({"cluster": "c1", "ns": ""}) is None

    cols = {
        "cluster": np.array(["c1", "c2"], dtype=object),
        "ns": np.array(["n1", None], dtype=object),
        "pod": np.array(["p1", "p2"], dtype=object),
    }
    out = t.expand_columns(cols)
    assert out[0] == "urn:kubernetes:/c1:n1/pod/p1"
    assert out[1] is None


def test_urn_template_no_vars():
    t = UrnTemplate("urn:static")
    assert t.expand_row({}) == "urn:static"
    assert list(t.expand_columns({"x": np.array(["a"], dtype=object)})) == ["urn:static"]


# ---------------------------------------------------------------------------
# functions/vectors.py — zero-copy embedding ingestion + vectorized top-k emit
# ---------------------------------------------------------------------------

def test_stack_list_column_layouts():
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.functions.vectors import stack_list_column

    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    # variable-offset list<float> (the parquet read layout)
    off = pa.array(np.arange(0, 15, 3, dtype=np.int32))
    lst = pa.ListArray.from_arrays(off, pa.array(mat.ravel()))
    assert np.array_equal(stack_list_column(lst), mat.astype(np.float64))
    # fixed_size_list
    fsl = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), 3)
    assert np.array_equal(stack_list_column(fsl), mat.astype(np.float64))
    # chunked
    ch = pa.chunked_array([lst.slice(0, 2), lst.slice(2, 2)])
    assert np.array_equal(stack_list_column(ch), mat.astype(np.float64))
    # sliced (offsets no longer start at 0 — flatten() must honor the slice)
    assert np.array_equal(stack_list_column(lst.slice(1, 2)), mat[1:3].astype(np.float64))
    # ragged input fails loudly (no caller can use a non-rectangular batch)
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    import pytest

    with pytest.raises(ValueError, match="ragged"):
        stack_list_column(pa.chunked_array([ragged]))
    # empty
    assert stack_list_column(pa.array([], pa.list_(pa.float64()))).shape[0] == 0


def test_topk_partials_matches_loop():
    from sts_opentelemetry_collector_ray.functions.vectors import topk_partials

    rng = np.random.default_rng(7)
    sims = rng.standard_normal((20, 3))
    ids = rng.permutation(20).astype(np.int64)
    qids = np.array([100, 200, 300], dtype=np.int64)
    for take in (5, 20, 25):
        qid, nid, sco = topk_partials(sims, ids, qids, take)
        eff = min(take, 20)
        assert len(qid) == eff * 3
        for qi in range(3):
            got = {(int(a), float(c)) for a, b, c in zip(nid, qid, sco) if b == qids[qi]}
            col = sims[:, qi]
            order = np.argsort(-col)[:eff]
            want = {(int(ids[p]), float(col[p])) for p in order}
            assert got == want, (take, qi)
