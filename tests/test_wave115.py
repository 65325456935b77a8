"""Edge-case tests for wave-115 operators: tokenizer fertility (hand-counted
chars/tokens with punctuation splitting inflating token counts; languages
aggregate separately) and suppliers-per-order (duplicate lineitems from the
same supplier count once; the multi-supplier share is exact). Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic
values."""

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


def test_fertility_hand_counted(tmp_path):
    docs = [
        # "ab cd" → tokens [ab, cd] = 2; chars 5 → fertility 2.5
        (0, "ab cd", "en"),
        # "a,b!" → tokens [a, ',', b, '!'] = 4; chars 4 → fertility 1.0
        (1, "a,b!", "xx"),
    ]
    _write(str(tmp_path), "documents", pd.DataFrame(
        {
            "doc_id": np.array([d[0] for d in docs], np.int64),
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
            "source": ["s"] * len(docs),
            "n_chars": np.array([len(d[1]) for d in docs], np.int64),
        },
    ))
    g = _compare("docs_tokenizer_fertility", str(tmp_path), ["documents"]).set_index(
        "lang"
    )
    assert int(g.loc["en", "total_tokens"]) == 2
    assert int(g.loc["en", "fertility_micro"]) == 2_500_000
    assert int(g.loc["xx", "total_tokens"]) == 4
    assert int(g.loc["xx", "fertility_micro"]) == 1_000_000


def test_suppliers_per_order_distincts(tmp_path):
    li = [
        (1, 10), (1, 10), (1, 20),  # order 1: 2 distinct suppliers (dup line)
        (2, 10),                    # order 2: 1 supplier
        (3, 10), (3, 20), (3, 30),  # order 3: 3 suppliers
    ]
    n = len(li)
    _write(str(tmp_path), "lineitem", pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in li], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in li], np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.ones(n),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
        },
    ))
    g = _compare("orders_suppliers_per_order", str(tmp_path), ["lineitem"]).set_index(
        "n_suppliers"
    )
    assert int(g.loc[1, "n_orders"]) == 1
    assert int(g.loc[2, "n_orders"]) == 1
    assert int(g.loc[3, "n_orders"]) == 1
    assert int(g.loc[1, "multi_bp"]) == 2 * 10_000 // 3
