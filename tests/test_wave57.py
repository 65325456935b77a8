"""Edge-case tests for wave-57 operators: synchronous LPA on a hand-traced
star graph (the deterministic bipartite oscillation) and Theil–Sen on a
3-day series with an outlier day (median slope ignores the spike pair count
imbalance). Ray vs DuckDB equality is enforced per-query by the strict
sweep; these pin analytic values on tiny adversarial tables."""

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


def _lineitem(rows):
    # rows: (l_orderkey, l_suppkey)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in rows], np.int64),
            "l_linenumber": np.ones(n, np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
        }
    )


def test_lpa_star_oscillation(tmp_path):
    # customers 1,2,3 each order from supplier 1: star with center 2s+1=3,
    # leaves 2c = 2,4,6. Hand trace (labels start = node id):
    #  r1: leaves adopt {3} -> 3; center ties on {2,4,6} -> min 2
    #  r2: leaves adopt {2} -> 2; center adopts {3,3,3} -> 3
    #  r3: leaves -> 3; center -> 2  (the deterministic bipartite oscillation)
    orders = _orders(
        [(1, 1, 1.0, "2024-01-01"), (2, 2, 1.0, "2024-01-01"), (3, 3, 1.0, "2024-01-01")]
    )
    li = _lineitem([(1, 1), (2, 1), (3, 1)])
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "graph_lpa_communities", str(tmp_path), ["orders", "lineitem"]
    ).set_index("node")
    assert int(g.loc[3, "community"]) == 2  # supplier center
    for leaf in (2, 4, 6):
        assert int(g.loc[leaf, "community"]) == 3


def test_theilsen_outlier_day(tmp_path):
    # daily revenue cents: day0=100, day1=200, day2=10000 (spike)
    # slopes: 100, 4950, 9800 -> lower median = 4950 cents/day
    orders = _orders(
        [
            (1, 1, 1.0, "2024-01-01"),
            (2, 1, 2.0, "2024-01-02"),
            (3, 1, 100.0, "2024-01-03"),
        ]
    )
    _write(str(tmp_path), "orders", orders)
    g = _compare("orders_theilsen_trend", str(tmp_path), ["orders"]).iloc[0]
    assert int(g.n_days) == 3 and int(g.n_pairs) == 3
    assert int(g.slope_micro) == 4_950_000_000
