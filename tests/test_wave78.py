"""Edge-case tests for wave-78 operators: median inter-order gap (odd vs even
gap counts, duplicate-day zero gaps, single-order customers excluded) and
part-type market share (exact micro ratio, zero-share years, the target type
vs others). Ray vs DuckDB equality is enforced per-query by the strict sweep;
these pin analytic values on tiny adversarial tables."""

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


def test_gap_median_odd_even_dup_days(tmp_path):
    orders = _orders(
        [
            # cust 1: days 0, 10, 12 -> gaps [10, 2] -> even, median 6.0
            (1, 1, "2024-01-01"),
            (2, 1, "2024-01-11"),
            (3, 1, "2024-01-13"),
            # cust 2: days 0, 0, 7 -> gaps [0, 7] -> median 3.5
            (4, 2, "2024-02-01"),
            (5, 2, "2024-02-01"),
            (6, 2, "2024-02-08"),
            # cust 3: gaps [1, 2, 9] -> odd, median 2
            (7, 3, "2024-03-01"),
            (8, 3, "2024-03-02"),
            (9, 3, "2024-03-04"),
            (10, 3, "2024-03-13"),
            # cust 4: single order -> excluded
            (11, 4, "2024-04-01"),
        ]
    )
    _write(str(tmp_path), "orders", orders)
    g = _compare("orders_gap_median", str(tmp_path), ["orders"]).set_index(
        "o_custkey"
    )
    assert 4 not in g.index
    assert int(g.loc[1, "median_gap_micro"]) == 6_000_000
    assert int(g.loc[2, "median_gap_micro"]) == 3_500_000
    assert int(g.loc[3, "median_gap_micro"]) == 2_000_000
    assert int(g.loc[3, "n_orders"]) == 4


def _part(rows):
    n = len(rows)
    return pd.DataFrame(
        {
            "p_partkey": np.array([r[0] for r in rows], np.int64),
            "p_name": [f"part {r[0]}" for r in rows],
            "p_brand": ["Brand#1"] * n,
            "p_type": [r[1] for r in rows],
            "p_size": np.ones(n, np.int32),
            "p_retailprice": np.ones(n, np.float64),
        }
    )


def _lineitem(rows):
    # rows: (l_partkey, shipdate, extprice, discount)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "l_partkey": np.array([r[0] for r in rows], np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.array([r[2] for r in rows], np.float64),
            "l_discount": np.array([r[3] for r in rows], np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_part_type_share_ratio_and_zero_year(tmp_path):
    part = _part([(1, "PROMO"), (2, "ECONOMY")])
    li = _lineitem(
        [
            (1, "1996-05-01", 30.0, 0.0),  # 1996 PROMO: 30
            (2, "1996-06-01", 90.0, 0.0),  # 1996 other: 90 -> share 25%
            (2, "1997-01-01", 50.0, 0.0),  # 1997: no promo -> share 0
        ]
    )
    _write(str(tmp_path), "part", part)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("part_type_share", str(tmp_path), ["part", "lineitem"]).set_index(
        "ship_year"
    )
    assert int(g.loc[1996, "share_micro"]) == 250_000
    assert int(g.loc[1996, "total_micro"]) == 120_000_000
    assert int(g.loc[1997, "share_micro"]) == 0
