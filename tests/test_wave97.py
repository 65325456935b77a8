"""Edge-case tests for wave-97 operators: Q7 volume shipping (only
cross-nation pairs count and the direction splits the rows; same-nation and
out-of-window lines are excluded) and daily backlog (a same-day full ship
contributes nothing; overlapping orders stack; the curve ends the day
before the last ship). Ray vs DuckDB equality is enforced per-query by the
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
    # rows: (o_orderkey, o_custkey, o_orderdate)
    return pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.array([r[1] for r in rows], np.int64),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": np.zeros(len(rows)),
            "o_orderdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )


def _lineitem(rows):
    # rows: (l_orderkey, l_suppkey, l_shipdate, l_extendedprice, l_discount)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in rows], np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.array([r[3] for r in rows]),
            "l_discount": np.array([r[4] for r in rows]),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_q7_cross_pairs_only(tmp_path):
    d = str(tmp_path)
    _write(d, "nation", pd.DataFrame(
        {"n_nationkey": np.array([2, 7, 9], np.int32),
         "n_name": ["NATION_2", "NATION_7", "NATION_9"],
         "n_regionkey": np.array([0, 0, 1], np.int32)}))
    _write(d, "supplier", pd.DataFrame(
        {"s_suppkey": np.array([10, 20, 30], np.int64),
         "s_name": ["a", "b", "c"],
         "s_nationkey": np.array([2, 7, 9], np.int32),
         "s_acctbal": np.zeros(3)}))
    _write(d, "customer", pd.DataFrame(
        {"c_custkey": np.array([1, 2, 3], np.int64),
         "c_name": ["x", "y", "z"],
         "c_nationkey": np.array([2, 7, 9], np.int32),
         "c_acctbal": np.zeros(3),
         "c_mktsegment": ["M"] * 3}))
    _write(d, "orders", _orders([
        (100, 2, "1995-02-01"),  # cust NATION_7
        (200, 1, "1996-02-01"),  # cust NATION_2
        (300, 1, "1995-02-01"),  # cust NATION_2 (same-nation pair w/ supp 10)
        (400, 3, "1995-02-01"),  # cust NATION_9 — out of pair
    ]))
    _write(d, "lineitem", _lineitem([
        (100, 10, "1995-03-01", 100.0, 0.00),  # N2→N7 in 1995 ✓
        (100, 10, "1996-03-01", 50.0, 0.10),   # N2→N7 in 1996 ✓ (45.00)
        (100, 10, "1997-03-01", 999.0, 0.00),  # out of ship window ✗
        (200, 20, "1996-04-01", 70.0, 0.00),   # N7→N2 in 1996 ✓
        (300, 10, "1995-03-01", 999.0, 0.00),  # N2→N2 same nation ✗
        (400, 10, "1995-03-01", 999.0, 0.00),  # cust N9 ✗
        (200, 30, "1996-04-01", 999.0, 0.00),  # supp N9 ✗
    ]))
    g = _compare("q7_volume_shipping", d,
                 ["lineitem", "orders", "supplier", "customer", "nation"]
                 ).set_index(["supp_nation", "cust_nation", "l_year"])
    assert int(g.loc[("NATION_2", "NATION_7", 1995), "revenue_micro"]) == 100_000_000
    assert int(g.loc[("NATION_2", "NATION_7", 1996), "revenue_micro"]) == 45_000_000
    assert int(g.loc[("NATION_7", "NATION_2", 1996), "revenue_micro"]) == 70_000_000
    assert len(g) == 3


def test_backlog_stacking_and_sameday_ship(tmp_path):
    d = str(tmp_path)
    day0 = "2024-01-01"
    _write(d, "orders", _orders([
        (1, 1, day0),            # ships D+3 → open D0..D2
        (2, 1, "2024-01-02"),    # ships D+2 (max of two lines) → open D1..D3
        (3, 1, "2024-01-02"),    # same-day ship → never open
        (4, 1, "2024-01-03"),    # no lineitems → excluded
    ]))
    _write(d, "lineitem", _lineitem([
        (1, 1, "2024-01-04", 1.0, 0.0),
        (2, 1, "2024-01-03", 1.0, 0.0),
        (2, 1, "2024-01-04", 1.0, 0.0),
        (3, 1, "2024-01-02", 1.0, 0.0),
    ]))
    g = _compare("orders_backlog_daily", d, ["orders", "lineitem"]).set_index("day")
    d0 = int(pd.Timestamp(day0).timestamp() // 86400)
    assert int(g.loc[d0, "open_orders"]) == 1          # only order 1
    assert int(g.loc[d0 + 1, "open_orders"]) == 2      # 1 and 2 stack; 3 closed
    assert int(g.loc[d0 + 2, "open_orders"]) == 2
    assert d0 + 3 not in g.index                       # grid ends before last ship
