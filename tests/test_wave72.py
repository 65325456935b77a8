"""Edge-case tests for wave-72 operators: latency spread with a constant
supplier (variance 0) vs an erratic one (hand-computed variance) and a
one-shipment supplier (excluded); 2-core peeling on a path-plus-cycle graph
(the pendant chain peels away round by round, the cycle survives). Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

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
    # rows: (l_orderkey, l_suppkey, shipdate)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in rows], np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_latency_spread_constant_vs_erratic(tmp_path):
    orders = _orders(
        [(k, 1, "2024-01-01") for k in range(1, 6)]
    )
    li = _lineitem(
        [
            # supplier 1: latencies [5, 5] -> var 0
            (1, 1, "2024-01-06"), (2, 1, "2024-01-06"),
            # supplier 2: latencies [1, 9] -> var = ((1-5)^2+(9-5)^2)/2 = 16
            (3, 2, "2024-01-02"), (4, 2, "2024-01-10"),
            # supplier 3: single shipment -> excluded
            (5, 3, "2024-01-03"),
        ]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "supplier_latency_spread", str(tmp_path), ["orders", "lineitem"]
    ).set_index("s_suppkey")
    assert 3 not in g.index
    assert int(g.loc[2, "var_micro"]) == 16_000_000
    assert int(g.loc[1, "var_micro"]) == 0
    # erratic supplier ranks first (_compare re-sorts, so rank by value)
    assert g["var_micro"].idxmax() == 2


def test_kcore_cycle_survives_pendant_peels(tmp_path):
    # customers 1,2 and suppliers 1,2 form a 4-cycle (every node degree 2);
    # customer 3 hangs off supplier 1 only (degree 1 -> peeled round 1);
    # after it peels, the cycle nodes still have degree >= 2 -> all survive
    orders = _orders(
        [
            (1, 1, "2024-01-01"), (2, 1, "2024-01-01"),
            (3, 2, "2024-01-01"), (4, 2, "2024-01-01"),
            (5, 3, "2024-01-01"),
        ]
    )
    li = _lineitem(
        [
            (1, 1, "2024-01-02"), (2, 2, "2024-01-02"),  # cust1 - supp1, supp2
            (3, 1, "2024-01-02"), (4, 2, "2024-01-02"),  # cust2 - supp1, supp2
            (5, 1, "2024-01-02"),  # cust3 - supp1 only (pendant)
        ]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("graph_kcore", str(tmp_path), ["orders", "lineitem"])
    nodes = set(int(x) for x in g.node)
    # cycle: cust 1,2 -> nodes 2,4; supp 1,2 -> nodes 3,5. pendant cust3 = 6
    assert nodes == {2, 3, 4, 5}
    assert 6 not in nodes
