"""Edge-case tests for wave-33 operators: triangle counting on a hand-built
graph (two shared triangles + a dangling edge + a duplicate-lineitem order)
and the Q6 pushdown scan on predicate-boundary rows. Tiny adversarial tables
run through BOTH the Ray query and its DuckDB oracle."""

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


def _compare(name: str, sf_dir: str) -> pd.DataFrame:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def _lineitem(rows):
    df = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    df["l_orderkey"] = df["l_orderkey"].astype(np.int64)
    df["l_partkey"] = df["l_partkey"].astype(np.int64)
    df["l_suppkey"] = np.int64(1)
    df["l_linenumber"] = np.arange(len(df), dtype=np.int32)
    df["l_tax"] = 0.0
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"]).astype("datetime64[us]")
    return df


def test_triangles_known_graph(tmp_path):
    # order 1 -> parts {1,2,3}: triangle (1,2,3)
    # order 2 -> parts {2,3,4}: triangle (2,3,4); edges (2,3) shared
    # order 3 -> parts {5,6}: dangling edge, no triangle
    # order 4 -> parts {1,1,2} with a duplicated lineitem row: no new edges
    rows = []
    for o, parts in [(1, [1, 2, 3]), (2, [2, 3, 4]), (3, [5, 6]), (4, [1, 1, 2])]:
        for p in parts:
            rows.append([o, p, 1.0, 100.0, 0.0, "1995-06-01"])
    _write(str(tmp_path), "lineitem", _lineitem(rows))
    g = _compare("graph_triangles", str(tmp_path))
    rec = g.iloc[0]
    assert int(rec.triangles) == 2
    assert int(rec.n_edges) == 6  # (1,2)(1,3)(2,3)(2,4)(3,4)(5,6); order 4 adds none
    assert int(rec.n_nodes) == 6


def test_q6_predicate_boundaries(tmp_path):
    rows = [
        # in: inside all ranges
        [1, 1, 10.0, 1000.0, 0.05, "1995-06-01"],
        # in: discount exactly at both bounds (BETWEEN is inclusive)
        [2, 2, 10.0, 500.0, 0.03, "1995-01-01"],
        [3, 3, 23.0, 200.0, 0.07, "1995-12-31"],
        # out: quantity at the exclusive bound
        [4, 4, 24.0, 999.0, 0.05, "1995-06-01"],
        # out: shipdate one day outside either end
        [5, 5, 1.0, 999.0, 0.05, "1994-12-31"],
        [6, 6, 1.0, 999.0, 0.05, "1996-01-01"],
        # out: discount outside the band
        [7, 7, 1.0, 999.0, 0.08, "1995-06-01"],
    ]
    _write(str(tmp_path), "lineitem", _lineitem(rows))
    g = _compare("q6_selective_scan", str(tmp_path))
    rec = g.iloc[0]
    assert int(rec.n) == 3
    # 100000*5 + 50000*3 + 20000*7 = 790000
    assert int(rec.rev) == 790000
