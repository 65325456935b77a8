"""Edge-case tests for wave-60 operators: duplicate-invoice pairs with an
exactly-on-boundary date gap, a transitive triple (3 pairs, 3 orders), and
amount/customer near-misses; Zipf slope on a constructed exact power law
(slope exactly -1). Ray vs DuckDB equality is enforced per-query by the
strict sweep; these pin analytic values on tiny adversarial tables."""

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


def _orders(rows):
    # rows: (o_orderkey, o_custkey, total, date_iso)
    n = len(rows)
    return pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.array([r[1] for r in rows], np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.array([r[2] for r in rows], np.float64),
            "o_orderdate": pd.to_datetime([r[3] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )


def test_duplicate_invoices_boundaries_and_triple(tmp_path):
    rows = [
        # cust 1: triple of identical invoices on days 1, 4, 8 — gaps 3, 4, 7
        # all <= 7 -> 3 pairs, 3 orders
        (1, 1, 50.0, "2024-01-01"),
        (2, 1, 50.0, "2024-01-04"),
        (3, 1, 50.0, "2024-01-08"),
        # cust 2: identical amount but 8 days apart -> no pair
        (4, 2, 30.0, "2024-01-01"),
        (5, 2, 30.0, "2024-01-09"),
        # cust 3 vs cust 4: same amount same day, DIFFERENT customers -> none
        (6, 3, 20.0, "2024-01-01"),
        (7, 4, 20.0, "2024-01-01"),
        # cust 5: same window, amounts differ by a cent -> no pair
        (8, 5, 10.00, "2024-01-01"),
        (9, 5, 10.01, "2024-01-02"),
    ]
    _write(str(tmp_path), "orders", _orders(rows))
    g = _compare("orders_duplicate_invoices", str(tmp_path), ["orders"]).iloc[0]
    assert int(g.n_pairs) == 3
    assert int(g.n_orders) == 3


def test_zipf_exact_power_law(tmp_path):
    # frequencies 840/rank for ranks 1..8 are all integers: exact slope -1
    freqs = [840 // r for r in range(1, 9)]
    words = [f"w{r:02d}" for r in range(1, 9)]
    text = " ".join(
        " ".join([w] * f) for w, f in zip(words, freqs)
    )
    df = pd.DataFrame(
        {
            "doc_id": np.array([1], np.int64),
            "text": [text],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": np.array([len(text)], np.int64),
        }
    )
    _write(str(tmp_path), "documents", df)
    g = _compare("docs_zipf_slope", str(tmp_path), ["documents"]).iloc[0]
    assert int(g.n_ranks) == 8
    assert int(g.n_pairs) == 28
    assert int(g.zipf_slope_micro) == -1_000_000
