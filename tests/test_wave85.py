"""Edge-case tests for wave-85 operators: sales cube (subtotals add up level
by level; a region with two nations rolls both into its subtotal; the grand
total matches the sum of regions) and centroid drift (identical halves drift
0; a planted shift lands exactly; a label present in one half only is
excluded). Ray vs DuckDB equality is enforced per-query by the strict sweep;
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


def test_sales_cube_subtotals(tmp_path):
    _write(
        str(tmp_path), "region",
        pd.DataFrame(
            {"r_regionkey": np.array([0, 1], np.int32),
             "r_name": ["AMERICA", "ASIA"]}
        ),
    )
    _write(
        str(tmp_path), "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([0, 1, 2], np.int32),
                "n_name": ["BRAZIL", "CANADA", "JAPAN"],
                "n_regionkey": np.array([0, 0, 1], np.int32),
            }
        ),
    )
    _write(
        str(tmp_path), "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2, 3], np.int64),
                "c_name": ["a", "b", "c"],
                "c_nationkey": np.array([0, 1, 2], np.int32),
                "c_acctbal": np.zeros(3, np.float64),
                "c_mktsegment": ["BUILDING"] * 3,
            }
        ),
    )
    _write(
        str(tmp_path), "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([1, 2, 3, 4], np.int64),
                "o_custkey": np.array([1, 2, 3, 1], np.int64),
                "o_orderstatus": ["O"] * 4,
                "o_totalprice": np.array([10.0, 20.0, 40.0, 5.0], np.float64),
                "o_orderdate": pd.to_datetime(["1996-01-01"] * 4).astype(
                    "datetime64[us]"
                ),
                "o_orderpriority": ["1-URGENT"] * 4,
            }
        ),
    )
    g = _compare(
        "sales_cube", str(tmp_path), ["region", "nation", "customer", "orders"]
    ).set_index(["region_name", "nation_name"])
    assert int(g.loc[("AMERICA", "BRAZIL"), "revenue_micro"]) == 15_000_000
    assert int(g.loc[("AMERICA", "ALL"), "revenue_micro"]) == 35_000_000
    assert int(g.loc[("ASIA", "ALL"), "revenue_micro"]) == 40_000_000
    assert int(g.loc[("ALL", "ALL"), "revenue_micro"]) == 75_000_000
    assert int(g.loc[("ALL", "ALL"), "n_orders"]) == 4


def test_centroid_drift_planted_shift(tmp_path):
    def v(x, d=0):
        vec = [0.0] * 64
        vec[d] = x
        return vec

    scale = 1 << 20
    rows = [
        # label 0: even ids at 0.0, odd ids at 0.25 -> drift on dim 0
        (2, 0, v(0.0)), (4, 0, v(0.0)),
        (1, 0, v(0.25)), (3, 0, v(0.25)),
        # label 1: identical halves -> drift2 == 0
        (6, 1, v(0.1, 1)), (7, 1, v(0.1, 1)),
        # label 2: only even ids -> excluded
        (8, 2, v(0.5, 2)),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [list(map(float, r[2])) for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t.replace_schema_metadata(None), f"{tmp_path}/embeddings.parquet")
    g = _compare("emb_centroid_drift", str(tmp_path), ["embeddings"]).set_index(
        "label"
    )
    shift = int(np.floor(0.25 * scale + 0.5))
    assert int(g.loc[0, "drift2"]) == shift * shift
    assert int(g.loc[0, "n_even"]) == 2 and int(g.loc[0, "n_odd"]) == 2
    assert int(g.loc[1, "drift2"]) == 0
    assert 2 not in g.index
