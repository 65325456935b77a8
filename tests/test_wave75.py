"""Edge-case tests for wave-75 operators: Q22 idle customers (positive-only
average, division-free strict threshold, anti-join vs the recent-order cutoff,
segment filter) and Q4 late-priority counts (EXISTS folds to max-shipday; the
60-day boundary is strict; out-of-window orders never count). Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic values
on tiny adversarial tables."""

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


def _customer(rows):
    # rows: (c_custkey, segment, acctbal)
    n = len(rows)
    return pd.DataFrame(
        {
            "c_custkey": np.array([r[0] for r in rows], np.int64),
            "c_name": [f"Customer#{r[0]}" for r in rows],
            "c_nationkey": np.zeros(n, np.int32),
            "c_acctbal": np.array([r[2] for r in rows], np.float64),
            "c_mktsegment": [r[1] for r in rows],
        }
    )


def _orders(rows):
    # rows: (o_orderkey, o_custkey, o_orderdate, priority)
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
            "o_orderpriority": [r[3] for r in rows],
        }
    )


def _lineitem(rows):
    # rows: (l_orderkey, shipdate)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_q22_threshold_antijoin_and_segment_filter(tmp_path):
    # positive balances in-scope: 100, 200, 300 -> avg 200 (negative -50
    # excluded from the average). Above-average (strict): 300 only... plus
    # 250 is below, 200 is NOT above (strict). Customer 4 (bal 900) is in an
    # out-of-scope segment. Customer 3 (bal 300) ordered recently -> excluded
    # by the anti-join. Customer 5 (bal 400, AUTOMOBILE) is idle -> the one hit.
    cust = _customer(
        [
            (1, "AUTOMOBILE", 100.0),
            (2, "BUILDING", 200.0),
            (3, "FURNITURE", 300.0),
            (5, "AUTOMOBILE", 400.0),
            (6, "BUILDING", -50.0),
            (4, "MACHINERY", 900.0),
        ]
    )
    orders = _orders(
        [
            (1, 3, "1999-06-01", "1-URGENT"),  # recent -> cust 3 active
            (2, 5, "1998-12-31", "1-URGENT"),  # before cutoff -> still idle
        ]
    )
    _write(str(tmp_path), "customer", cust)
    _write(str(tmp_path), "orders", orders)
    g = _compare("q22_idle_customers", str(tmp_path), ["customer", "orders"])
    # scope avg over positives {100,200,300,400} = 250 -> above: 300 (active),
    # 400 (idle). only customer 5 survives the anti-join.
    assert list(g["c_mktsegment"]) == ["AUTOMOBILE"]
    assert int(g.loc[0, "n_cust"]) == 1
    assert int(g.loc[0, "sum_acctbal_micro"]) == 400_000_000


def test_q4_late_boundary_and_window(tmp_path):
    orders = _orders(
        [
            (1, 1, "1996-02-01", "1-URGENT"),  # late by 61 days -> counts
            (2, 1, "1996-02-01", "1-URGENT"),  # exactly 60 days -> strict, no
            (3, 1, "1995-01-01", "2-HIGH"),  # outside window, even if late
            (4, 1, "1996-03-01", "3-MEDIUM"),  # max(ship) late among several
        ]
    )
    li = _lineitem(
        [
            (1, "1996-04-02"),  # +61
            (2, "1996-04-01"),  # +60 exactly
            (3, "1996-01-01"),  # +365 but order out of window
            (4, "1996-03-05"),  # +4
            (4, "1996-05-10"),  # +70 -> max wins
        ]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("q4_priority_late", str(tmp_path), ["orders", "lineitem"]).set_index(
        "o_orderpriority"
    )
    assert int(g.loc["1-URGENT", "order_count"]) == 1
    assert int(g.loc["3-MEDIUM", "order_count"]) == 1
    assert "2-HIGH" not in g.index
