"""Edge-case tests for wave-73 operators: Q10 returned-revenue (only 'R'
items count, orders outside the window excluded, discount applied, ties break
by custkey) and Q15 top supplier (global max survives bucket-local maxima,
revenue ties return BOTH suppliers, out-of-window shipments excluded). Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin analytic
values on tiny adversarial tables."""

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
    # rows: (o_orderkey, o_custkey, o_orderdate)
    n = len(rows)
    return pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.array([r[1] for r in rows], np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.ones(n, np.float64),
            "o_orderdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )


def _lineitem(rows):
    # rows: (l_orderkey, l_suppkey, shipdate, extprice, discount, returnflag)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in rows], np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.array([r[3] for r in rows], np.float64),
            "l_discount": np.array([r[4] for r in rows], np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": [r[5] for r in rows],
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def _customer(keys, nations):
    n = len(keys)
    return pd.DataFrame(
        {
            "c_custkey": np.array(keys, np.int64),
            "c_name": [f"Customer#{k}" for k in keys],
            "c_nationkey": np.array(nations, np.int32),
            "c_acctbal": np.zeros(n, np.float64),
            "c_mktsegment": ["BUILDING"] * n,
        }
    )


def _nation():
    return pd.DataFrame(
        {
            "n_nationkey": np.array([0, 1], np.int32),
            "n_name": ["ALGERIA", "ARGENTINA"],
            "n_regionkey": np.array([0, 1], np.int32),
        }
    )


def test_q10_window_flag_and_discount(tmp_path):
    orders = _orders(
        [
            (1, 10, "1996-02-01"),  # in window
            (2, 20, "1996-03-15"),  # in window
            (3, 10, "1995-12-31"),  # before window -> excluded
            (4, 20, "1996-04-01"),  # at exclusive upper bound -> excluded
        ]
    )
    li = _lineitem(
        [
            (1, 1, "1996-02-05", 100.0, 0.10, "R"),  # cust 10: 90.0
            (1, 1, "1996-02-06", 50.0, 0.00, "N"),  # not returned -> excluded
            (2, 1, "1996-03-20", 40.0, 0.50, "R"),  # cust 20: 20.0
            (3, 1, "1996-01-02", 999.0, 0.00, "R"),  # order outside window
            (4, 1, "1996-04-02", 999.0, 0.00, "R"),  # order outside window
        ]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    _write(str(tmp_path), "customer", _customer([10, 20], [0, 1]))
    _write(str(tmp_path), "nation", _nation())
    g = _compare(
        "q10_returned_revenue",
        str(tmp_path),
        ["orders", "lineitem", "customer", "nation"],
    ).set_index("c_custkey")
    assert set(g.index) == {10, 20}
    assert int(g.loc[10, "revenue_micro"]) == 90_000_000
    assert int(g.loc[20, "revenue_micro"]) == 20_000_000
    assert g.loc[10, "n_name"] == "ALGERIA"
    assert g.loc[20, "n_name"] == "ARGENTINA"
    assert int(g.loc[10, "n_items"]) == 1


def test_q15_tie_returns_both_and_window_excludes(tmp_path):
    orders = _orders([(k, 1, "1996-01-15") for k in range(1, 6)])
    li = _lineitem(
        [
            # supplier 1: 60 + 40 = 100
            (1, 1, "1996-01-10", 60.0, 0.0, "N"),
            (2, 1, "1996-02-10", 40.0, 0.0, "N"),
            # supplier 2: 100 exactly (tie with supplier 1)
            (3, 2, "1996-03-10", 200.0, 0.5, "N"),
            # supplier 3: would win but ships outside the window
            (4, 3, "1995-06-01", 500.0, 0.0, "N"),
            # supplier 4: below max
            (5, 4, "1996-02-20", 99.0, 0.0, "N"),
        ]
    )
    supp = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2, 3, 4], np.int64),
            "s_name": [f"Supplier#{k}" for k in (1, 2, 3, 4)],
            "s_nationkey": np.zeros(4, np.int32),
            "s_acctbal": np.zeros(4, np.float64),
        }
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    _write(str(tmp_path), "supplier", supp)
    g = _compare("q15_top_supplier", str(tmp_path), ["lineitem", "supplier"])
    assert set(g["s_suppkey"]) == {1, 2}  # _compare re-sorts; order-insensitive
    assert set(g["total_revenue_micro"]) == {100_000_000}
    assert set(g["s_name"]) == {"Supplier#1", "Supplier#2"}
