"""Edge-case tests for wave-126 operators: Simpson diversity extremes (all
tokens identical → λ = 1; all distinct → λ = 0) and dwell-time bounds
(totals non-negative, interval count = turns − conversations). The value
contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def test_simpson_extremes(tmp_path):
    import os

    os.makedirs(tmp_path, exist_ok=True)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": ["same same same same", "all words fully distinct"],
            "lang": ["en"] * 2,
            "source": ["mono", "poly"],
            "n_chars": np.array([19, 24], np.int64),
        }
    )
    t = pa.Table.from_pandas(docs, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    got = entrymod.queries()["docs_simpson_diversity"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    by = got.set_index("source")
    # 4 identical tokens: sum c(c-1) = 12 = N(N-1) → λ = 1
    assert int(by.loc["mono", "simpson_micro"]) == 1_000_000
    assert int(by.loc["mono", "n_distinct"]) == 1
    # 4 distinct tokens: λ = 0
    assert int(by.loc["poly", "simpson_micro"]) == 0
    assert int(by.loc["poly", "n_distinct"]) == 4


def test_severity_dwell_bounds():
    got = entrymod.queries()["conv_severity_dwell"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert (got["total_sec"] >= 0).all()
    assert (got["n_intervals"] > 0).all()
    # every turn except the last of each conversation contributes exactly one
    # interval, regardless of severity
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    n_turns, n_convs = con.execute(
        "SELECT count(*), count(DISTINCT user_id) FROM events"
    ).fetchone()
    assert int(got["n_intervals"].sum()) == n_turns - n_convs
