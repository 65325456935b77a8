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
