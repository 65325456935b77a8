"""Edge-case tests for wave-74 operators: Q17 small-quantity revenue (only
the chosen brand's parts count, the 20%-of-average threshold is strict, the
yearly divisor floors) and Q18 volume customers (the quantity threshold is
strictly greater-than, multi-item orders re-reduce across batches). Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin analytic
values on tiny adversarial tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

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


def _lineitem(rows):
    # rows: (l_orderkey, l_partkey, qty, extprice)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.array([r[1] for r in rows], np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.array([r[2] for r in rows], np.float64),
            "l_extendedprice": np.array([r[3] for r in rows], np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["1996-02-01"] * n).astype("datetime64[us]"),
        }
    )


def _part(rows):
    # rows: (p_partkey, p_brand)
    n = len(rows)
    return pd.DataFrame(
        {
            "p_partkey": np.array([r[0] for r in rows], np.int64),
            "p_name": [f"part {k}" for k, _ in rows],
            "p_brand": [r[1] for r in rows],
            "p_type": ["STANDARD"] * n,
            "p_size": np.ones(n, np.int32),
            "p_retailprice": np.ones(n, np.float64),
        }
    )


def _orders(rows):
    # rows: (o_orderkey, o_custkey, o_totalprice, o_orderdate)
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


def _customer(keys):
    n = len(keys)
    return pd.DataFrame(
        {
            "c_custkey": np.array(keys, np.int64),
            "c_name": [f"Customer#{k}" for k in keys],
            "c_nationkey": np.zeros(n, np.int32),
            "c_acctbal": np.zeros(n, np.float64),
            "c_mktsegment": ["BUILDING"] * n,
        }
    )


def test_q17_brand_filter_and_threshold(tmp_path):
    # part 1 (Brand#13): quantities [10, 10, 1] -> avg 7, cutoff 1.4 -> only
    # the qty-1 row (price 700) qualifies. part 2 (other brand): tiny qty but
    # wrong brand -> never counted.
    part = _part([(1, "Brand#13"), (2, "Brand#99")])
    li = _lineitem(
        [
            (1, 1, 10.0, 100.0),
            (2, 1, 10.0, 100.0),
            (3, 1, 1.0, 700.0),
            (4, 2, 1.0, 9999.0),
        ]
    )
    _write(str(tmp_path), "part", part)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("q17_small_qty_revenue", str(tmp_path), ["part", "lineitem"])
    assert int(g.loc[0, "n_small"]) == 1
    assert int(g.loc[0, "avg_yearly_micro"]) == 700_000_000 // 7


def test_q18_strict_threshold_and_cross_batch_sum(tmp_path):
    # order 1: 150 + 100 = 250 exactly -> NOT above the strict threshold.
    # order 2: 150 + 101 = 251 -> qualifies. order 3: small.
    li = _lineitem(
        [
            (1, 1, 150.0, 1.0),
            (1, 1, 100.0, 1.0),
            (2, 1, 150.0, 1.0),
            (2, 1, 101.0, 1.0),
            (3, 1, 5.0, 1.0),
        ]
    )
    orders = _orders(
        [(1, 7, 1000.0, "1996-01-01"), (2, 8, 500.0, "1996-01-02"), (3, 7, 2000.0, "1996-01-03")]
    )
    _write(str(tmp_path), "lineitem", li)
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "customer", _customer([7, 8]))
    g = _compare(
        "q18_volume_customers", str(tmp_path), ["lineitem", "orders", "customer"]
    )
    assert list(g["o_orderkey"]) == [2]
    assert int(g.loc[0, "sum_qty_micro"]) == 251_000_000
    assert g.loc[0, "c_name"] == "Customer#8"
