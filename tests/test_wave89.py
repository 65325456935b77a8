"""Edge-case tests for wave-89 operators: stylometry (a function-word-free
doc maximizes distance; an empty doc is excluded; exact micro frequencies)
and assortativity (a perfect star is maximally disassortative r = −1; a
regular bipartite clique has undefined variance → 0 by the guard). Ray vs
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


def test_stylometry_outlier_and_empty(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": [
                "the cat sat on the mat in the house",  # function-word heavy
                "zebra quagga okapi gnu impala kudu",  # zero function words
                "",  # empty -> excluded
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": np.array([35, 34, 0], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_stylometry_outliers", str(tmp_path), ["documents"])
    assert set(g["doc_id"]) == {1, 2}
    d = g.set_index("doc_id")
    # the zero-function-word doc is farther from the (mixed) corpus profile
    assert int(d.loc[2, "l1_micro"]) != int(d.loc[1, "l1_micro"])
    assert int(d.loc[2, "n_tokens"]) == 6


def _orders_li(tmp_path, pairs):
    # build orders/lineitem so that distinct (cust, supp) pairs == `pairs`
    orders, li = [], []
    for i, (c, s) in enumerate(pairs, start=1):
        orders.append((i, c))
        li.append((i, s))
    odf = pd.DataFrame(
        {
            "o_orderkey": np.array([o[0] for o in orders], np.int64),
            "o_custkey": np.array([o[1] for o in orders], np.int64),
            "o_orderstatus": ["O"] * len(orders),
            "o_totalprice": np.ones(len(orders), np.float64),
            "o_orderdate": pd.to_datetime(["1996-01-01"] * len(orders)).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(orders),
        }
    )
    ldf = pd.DataFrame(
        {
            "l_orderkey": np.array([x[0] for x in li], np.int64),
            "l_partkey": np.ones(len(li), np.int64),
            "l_suppkey": np.array([x[1] for x in li], np.int64),
            "l_linenumber": np.arange(1, len(li) + 1, dtype=np.int64),
            "l_quantity": np.ones(len(li), np.float64),
            "l_extendedprice": np.ones(len(li), np.float64),
            "l_discount": np.zeros(len(li), np.float64),
            "l_tax": np.zeros(len(li), np.float64),
            "l_returnflag": ["N"] * len(li),
            "l_linestatus": ["O"] * len(li),
            "l_shipdate": pd.to_datetime(["1996-02-01"] * len(li)).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "orders", odf)
    _write(str(tmp_path), "lineitem", ldf)


def test_assortativity_star_is_minus_one(tmp_path):
    # star: one supplier serves 4 customers -> perfectly disassortative
    _orders_li(tmp_path, [(1, 9), (2, 9), (3, 9), (4, 9)])
    g = _compare("graph_assortativity", str(tmp_path), ["orders", "lineitem"])
    assert int(g.loc[0, "n_edges"]) == 4
    assert int(g.loc[0, "n_customers"]) == 4
    assert int(g.loc[0, "n_suppliers"]) == 1
    assert int(g.loc[0, "assortativity_micro"]) == -1_000_000


def test_assortativity_regular_graph_guard(tmp_path):
    # 2×2 complete bipartite: every node degree 2 -> zero variance -> guard 0
    _orders_li(tmp_path, [(1, 8), (1, 9), (2, 8), (2, 9)])
    g = _compare("graph_assortativity", str(tmp_path), ["orders", "lineitem"])
    assert int(g.loc[0, "assortativity_micro"]) == 0
