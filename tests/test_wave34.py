"""Edge-case tests for wave-34 operators: weighted k-sampling when the table
is smaller than k and when all weights tie (pure hash order), and span
corruption on single-token / no-start documents. Tiny adversarial tables run
through BOTH the Ray query and its DuckDB oracle."""

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


def test_weighted_sample_small_table_and_tied_weights(tmp_path):
    # 8 rows < k=20: every row must be returned; equal weights reduce the
    # exponential race to pure hash order (both sides must agree on it).
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 9, dtype=np.int64),
            "o_custkey": np.ones(8, dtype=np.int64),
            "o_orderstatus": ["O"] * 8,
            "o_totalprice": np.full(8, 1000.0),
            "o_orderdate": pd.to_datetime(["1995-01-01"] * 8).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 8,
        }
    )
    _write(str(tmp_path), "orders", df)
    g = _compare("orders_weighted_sample_k", str(tmp_path), ["orders"])
    assert len(g) == 8


def test_span_corruption_tiny_docs(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                "one",  # single token: span clips at doc end
                "a b c d e f g h i j k l m n o p",  # several starts expected
                "x",  # may or may not start a span — oracle decides
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": np.array([3, 31, 1], dtype=np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_span_corruption", str(tmp_path), ["documents"])
    by_id = {int(r.doc_id): r for r in g.itertuples()}
    assert int(by_id[2].n_tokens) == 16
    # mask_csv must be sorted unique indices within range
    for r in by_id.values():
        if r.mask_csv:
            idxs = [int(x) for x in r.mask_csv.split(",")]
            assert idxs == sorted(set(idxs))
            assert all(0 <= i < int(r.n_tokens) for i in idxs)
            assert len(idxs) == int(r.n_masked)
        else:
            assert int(r.n_masked) == 0
