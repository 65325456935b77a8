"""Edge-case tests for wave-136 operators: coverage-curve arithmetic on a
hand-built Zipf-ish corpus (tie-mass invariance, small-vocab saturation) and
l-diversity on constructed QI groups (singleton leak, negative balances).
The value contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_docs(tmp_path, texts):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["web"] * n,
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def _write_customers(tmp_path, nations, segments, acctbals):
    n = len(nations)
    df = pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(n)],
            "c_nationkey": np.asarray(nations, dtype=np.int32),
            "c_acctbal": np.asarray(acctbals, dtype=np.float64),
            "c_mktsegment": segments,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/customer.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_coverage_small_vocab_saturates(tmp_path):
    # corpus: "a" ×5, "b" ×3, "c" ×1 -> vocab=3, tokens=9; every budget >= 3
    # covers everything and reports n_types = 3.
    _write_docs(tmp_path, ["a a a b b", "a a b c"])
    got = _run("docs_vocab_coverage", tmp_path).sort_values("budget")
    assert list(got["budget"]) == [100, 1000, 10000]
    assert list(got["n_types"]) == [3, 3, 3]
    assert list(got["covered_tokens"]) == [9, 9, 9]
    assert list(got["total_tokens"]) == [9, 9, 9]
    assert list(got["coverage_micro"]) == [1_000_000] * 3


def test_coverage_tie_mass_is_budget_exact(tmp_path):
    # 150 distinct words, each once (all tied at count 1), plus "z" ×50:
    # budget 100 takes z (50) + 99 tie words (99) = 149 of 200 tokens.
    words = " ".join(f"w{i}" for i in range(150))
    _write_docs(tmp_path, [words, "z " * 50])
    got = _run("docs_vocab_coverage", tmp_path).set_index("budget")
    assert int(got.loc[100, "covered_tokens"]) == 50 + 99
    assert int(got.loc[100, "n_types"]) == 100
    assert int(got.loc[1000, "covered_tokens"]) == 200
    assert int(got.loc[1000, "n_types"]) == 151


def test_l_diversity_leak_and_negative_bucket(tmp_path):
    # group (1, BUILDING): balances 500, 1500 -> buckets {0, 1} -> l = 2
    # group (2, AUTO): both 2300ish -> bucket {2} -> l = 1 (leaky)
    # group (3, AUTO): -400 -> bucket {-1}; floor semantics, not trunc
    _write_customers(
        tmp_path,
        nations=[1, 1, 2, 2, 3],
        segments=["BUILDING", "BUILDING", "AUTO", "AUTO", "AUTO"],
        acctbals=[500.0, 1500.0, 2300.0, 2999.0, -400.0],
    )
    got = _run("customer_l_diversity", tmp_path)
    got = got.set_index(["c_nationkey", "c_mktsegment"])
    assert int(got.loc[(1, "BUILDING"), "l_diversity"]) == 2
    assert int(got.loc[(2, "AUTO"), "l_diversity"]) == 1
    assert int(got.loc[(2, "AUTO"), "n_customers"]) == 2
    assert int(got.loc[(3, "AUTO"), "l_diversity"]) == 1
