"""Edge-case tests for wave-41 operators: CDC chunking on sub-window docs,
identical documents (chunks fully dedup), and shared-substring documents;
k-anonymity flags below-threshold quasi-identifier groups. Tiny adversarial
tables run through BOTH the Ray query and its DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, df: pd.DataFrame):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{dirpath}/{name}.parquet")


def _compare(name: str, sf_dir: str, tables: list[str]) -> pd.DataFrame:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def _docs(texts):
    return pd.DataFrame(
        {
            "doc_id": np.arange(1, len(texts) + 1, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )


def test_cdc_identical_docs_fully_dedup(tmp_path):
    body = "the quick brown fox jumps over the lazy dog " * 10
    _write(str(tmp_path), "documents", _docs([body, body, body]))
    g = _compare("docs_cdc_dedup", str(tmp_path), ["documents"])
    rec = g.iloc[0]
    # identical docs chunk identically AND the 10× intra-doc repetition
    # dedups further: unique bytes fall below even a single copy
    assert int(rec.bytes_total) == 3 * len(body)
    assert int(rec.n_chunks) % 3 == 0
    assert int(rec.bytes_unique) < len(body)
    assert 3 * int(rec.n_distinct) <= int(rec.n_chunks)


def test_cdc_subwindow_doc_is_one_chunk(tmp_path):
    _write(str(tmp_path), "documents", _docs(["abc", "xy", "abc"]))
    g = _compare("docs_cdc_dedup", str(tmp_path), ["documents"])
    rec = g.iloc[0]
    assert int(rec.n_chunks) == 3  # each doc one chunk (below window width)
    assert int(rec.n_distinct) == 2  # 'abc' dedups
    assert int(rec.bytes_total) == 8 and int(rec.bytes_unique) == 5


def test_k_anonymity_flags_small_groups(tmp_path):
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(1, 8, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(1, 8)],
            # nation 0 / BUILDING: 5 members (anonymous); nation 1 / AUTO: 2
            "c_nationkey": np.array([0, 0, 0, 0, 0, 1, 1], np.int32),
            "c_acctbal": np.zeros(7),
            "c_mktsegment": ["BUILDING"] * 5 + ["AUTOMOBILE"] * 2,
        }
    )
    _write(str(tmp_path), "customer", cust)
    g = _compare("customer_k_anonymity", str(tmp_path), ["customer"])
    m = {(int(r.c_nationkey), r.c_mktsegment): bool(r.anonymous) for r in g.itertuples()}
    assert m[(0, "BUILDING")] is True
    assert m[(1, "AUTOMOBILE")] is False
