"""Edge-case tests for wave-36 operators: Q5's cyclic same-nation condition
(cross-nation supplier rows must drop; regions with no qualifying rows must be
absent), and c-TF-IDF score ordering with a corpus-wide common term. Tiny
adversarial tables run through BOTH the Ray query and its DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, df=None, tbl=None):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = tbl if tbl is not None else pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(t.replace_schema_metadata(None), f"{dirpath}/{name}.parquet")


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


def test_q5_same_nation_condition(tmp_path):
    _write(
        str(tmp_path),
        "region",
        pd.DataFrame({"r_regionkey": np.array([0, 1], np.int64),
                      "r_name": ["R_A", "R_B"]}),
    )
    _write(
        str(tmp_path),
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([0, 1], np.int32),
                "n_name": ["N0", "N1"],
                "n_regionkey": np.array([0, 1], np.int32),
            }
        ),
    )
    _write(
        str(tmp_path),
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2], np.int64),
                "c_name": ["c1", "c2"],
                "c_nationkey": np.array([0, 1], np.int32),
                "c_acctbal": [0.0, 0.0],
                "c_mktsegment": ["BUILDING"] * 2,
            }
        ),
    )
    _write(
        str(tmp_path),
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": np.array([10, 11], np.int64),
                "s_name": ["s10", "s11"],
                "s_nationkey": np.array([0, 1], np.int32),
                "s_acctbal": [0.0, 0.0],
            }
        ),
    )
    _write(
        str(tmp_path),
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([100, 101], np.int64),
                "o_custkey": np.array([1, 2], np.int64),
                "o_orderstatus": ["O"] * 2,
                "o_totalprice": [1.0, 1.0],
                "o_orderdate": pd.to_datetime(["1996-06-01", "1996-06-01"]).astype(
                    "datetime64[us]"
                ),
                "o_orderpriority": ["1"] * 2,
            }
        ),
    )
    # order 100 (cust nation 0): one same-nation line (supp 10), one cross
    # (supp 11, nation 1) that MUST drop. order 101 (cust nation 1): only a
    # cross-nation line → region R_B must not appear at all.
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([100, 100, 101], np.int64),
            "l_partkey": np.array([1, 2, 3], np.int64),
            "l_suppkey": np.array([10, 11, 10], np.int64),
            "l_linenumber": np.array([1, 2, 1], np.int32),
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [100.0, 200.0, 300.0],
            "l_discount": [0.10, 0.10, 0.10],
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": pd.to_datetime(["1996-07-01"] * 3).astype("datetime64[us]"),
        }
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare("q5_local_supplier", str(tmp_path), [
        "region", "nation", "customer", "supplier", "orders", "lineitem"])
    assert g.r_name.tolist() == ["R_A"]
    assert int(g.n_items.iloc[0]) == 1
    assert int(g.revenue4.iloc[0]) == 10000 * 90  # 100.00$ × (100-10)


def test_ctfidf_common_term_ranks_low(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], np.int64),
            "text": [
                "alpha alpha alpha common",
                "beta beta common common",
                "gamma gamma gamma common",
                "delta common",
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": np.array([10] * 4, np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
            "embedding": pa.array([[0.0]] * 4, pa.list_(pa.float32())),
            "label": pa.array([0, 0, 1, 1], pa.int32()),
        }
    )
    _write(str(tmp_path), "embeddings", tbl=emb)
    g = _compare("docs_ctfidf_terms", str(tmp_path), ["documents", "embeddings"])
    # the label-0 description must rank 'alpha' above the corpus-wide 'common'
    l0 = g[g.label == 0].sort_values("score_micro", ascending=False)
    assert l0.term.iloc[0] == "alpha"
