"""Edge-case tests for wave-131 operators: Kendall tau-b exactness on
hand-built monotone / tied tables, and vocabulary-overlap Jaccard on a tiny
corpus with a disjoint source. The value contract itself is enforced by the
parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

from tests.test_wave130 import _write_lineitem


def test_kendall_monotone_and_anti(tmp_path):
    qty = [1, 2, 3, 4, 5] + [1, 2, 3, 4, 5]
    disc = [0.00, 0.01, 0.02, 0.03, 0.04] + [0.04, 0.03, 0.02, 0.01, 0.00]
    flag = ["A"] * 5 + ["R"] * 5
    _write_lineitem(tmp_path, qty, disc, flag)
    got = entrymod.queries()["lineitem_kendall"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.set_index("l_returnflag")
    assert int(got.loc["A", "kendall_micro"]) == 1_000_000
    assert int(got.loc["R", "kendall_micro"]) == -1_000_000


def test_kendall_ties_match_hand_computation(tmp_path):
    # x=[1,1,2], y(cents)=[0,1,1]: one concordant pair, two tie-excluded
    # pairs; tau-b = 1 / (sqrt(3-1)*sqrt(3-1)) = 0.5 -> 500000 micro.
    _write_lineitem(tmp_path, [1, 1, 2], [0.00, 0.01, 0.01])
    got = entrymod.queries()["lineitem_kendall"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert int(got.loc[got["l_returnflag"] == "A", "kendall_micro"].iloc[0]) == 500_000


def _write_documents(tmp_path, texts, sources):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def test_vocab_overlap_counts_and_absent_disjoint_pair(tmp_path):
    _write_documents(
        tmp_path,
        ["a b c", "B c d", "x"],
        ["s1", "s2", "s3"],
    )
    got = entrymod.queries()["docs_vocab_overlap"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    # only (s1, s2) share words (case-folded "b"); s3 is disjoint -> absent
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert int(r["n_a"]) == 3 and int(r["n_b"]) == 3
    assert int(r["n_common"]) == 2  # {b, c}
    assert int(r["jaccard_micro"]) == 500_000  # 2 / 4


def test_vocab_overlap_symmetric_full_overlap(tmp_path):
    _write_documents(tmp_path, ["w1 w2", "w2  w1"], ["a", "b"])
    got = entrymod.queries()["docs_vocab_overlap"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert int(got.iloc[0]["jaccard_micro"]) == 1_000_000
