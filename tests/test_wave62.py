"""Edge-case tests for wave-62 operators: trade-flow matrix on a hand-built
2-nation economy (known per-cell revenue, including a same-nation diagonal
cell) and ADC top-k on codebook-aligned vectors (ADC must rank the exact
codeword match first). Ray vs DuckDB equality is enforced per-query by the
strict sweep; these pin analytic values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, obj):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = (
        pa.Table.from_pandas(obj, preserve_index=False)
        if isinstance(obj, pd.DataFrame)
        else obj
    )
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


def test_nation_flow_two_nation_economy(tmp_path):
    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([0, 1], np.int64),
            "n_name": ["ALPHA", "BETA"],
            "n_regionkey": np.zeros(2, np.int64),
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], np.int64),
            "c_name": ["c1", "c2"],
            "c_nationkey": np.array([0, 1], np.int64),
            "c_acctbal": np.zeros(2, np.float64),
            "c_mktsegment": ["B"] * 2,
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2], np.int64),
            "s_name": ["s1", "s2"],
            "s_nationkey": np.array([0, 1], np.int64),
            "s_acctbal": np.zeros(2, np.float64),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([10, 20], np.int64),
            "o_custkey": np.array([1, 2], np.int64),
            "o_orderstatus": ["O"] * 2,
            "o_totalprice": np.ones(2, np.float64),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 2).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    # order 10 (cust 1 / ALPHA): items from supp 1 (ALPHA, diagonal) and
    # supp 2 (BETA); order 20 (cust 2 / BETA): item from supp 1 (ALPHA)
    li_rows = [(10, 1, 10.0), (10, 2, 20.0), (20, 1, 40.0)]
    nl = len(li_rows)
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in li_rows], np.int64),
            "l_partkey": np.ones(nl, np.int64),
            "l_suppkey": np.array([r[1] for r in li_rows], np.int64),
            "l_linenumber": np.arange(1, nl + 1, dtype=np.int64),
            "l_quantity": np.ones(nl, np.float64),
            "l_extendedprice": np.array([r[2] for r in li_rows], np.float64),
            "l_discount": np.zeros(nl, np.float64),
            "l_tax": np.zeros(nl, np.float64),
            "l_returnflag": ["N"] * nl,
            "l_linestatus": ["O"] * nl,
            "l_shipdate": pd.to_datetime(["2024-01-02"] * nl).astype(
                "datetime64[us]"
            ),
        }
    )
    for name, df in (
        ("nation", nation),
        ("customer", customer),
        ("supplier", supplier),
        ("orders", orders),
        ("lineitem", li),
    ):
        _write(str(tmp_path), name, df)
    g = _compare(
        "nation_flow_matrix",
        str(tmp_path),
        ["nation", "customer", "supplier", "orders", "lineitem"],
    ).set_index(["cust_nation", "supp_nation"])
    assert int(g.loc[("ALPHA", "ALPHA"), "revenue_micro"]) == 10_000_000
    assert int(g.loc[("ALPHA", "BETA"), "revenue_micro"]) == 20_000_000
    assert int(g.loc[("BETA", "ALPHA"), "revenue_micro"]) == 40_000_000
    assert int(g.loc[("BETA", "ALPHA"), "n_items"]) == 1
    assert len(g) == 3  # no (BETA, BETA) flow


def test_adc_ranks_codeword_match_first(tmp_path):
    from sts_opentelemetry_collector_ray.pipelines.queries54 import _pq_codebooks

    books = _pq_codebooks()
    # query (id 1) built from codewords [0,0,0,0]; neighbor 2 identical
    # (same codes -> maximal ADC score); neighbors 3.. use other codewords
    base = np.concatenate([books[m][0] for m in range(4)]).astype(np.float32)
    far = np.concatenate([books[m][5] for m in range(4)]).astype(np.float32)
    mid = np.concatenate(
        [books[0][0], books[1][0], books[2][5], books[3][5]]
    ).astype(np.float32)
    vecs = [base, base, mid, far]
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(1, len(vecs) + 1, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(np.zeros(len(vecs), np.int32)),
        }
    )
    _write(str(tmp_path), "embeddings", t)
    g = _compare("emb_pq_adc_topk", str(tmp_path), ["embeddings"])
    r1 = g[g.query_id == 1].sort_values("rank")
    assert list(r1.neighbor_id)[:3] == [2, 3, 4]
