"""Edge-case tests for wave-88 operators: sign codes (a vector aligned with
plane 0 sets bit 0; its negation flips every decided bit; an all-zero vector
codes to 0 — ties go to 0) and the segment pivot (missing segments fill 0,
the total column equals the row sum). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values on tiny adversarial
tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod
from sts_opentelemetry_collector_ray.pipelines.queries88 import _sc_signs


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


def test_sign_codes_alignment_negation_and_zero(tmp_path):
    S = _sc_signs()
    v0 = (S[0].astype(np.float64)) * 0.25  # aligned with plane 0
    rows = [
        (1, 0, v0),
        (2, 0, -v0),  # negation: every decided bit flips
        (3, 1, np.zeros(64)),  # all projections 0 -> code 0
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[2].astype(np.float32).tolist() for r in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t.replace_schema_metadata(None), f"{tmp_path}/embeddings.parquet")
    g = _compare("emb_sign_codes", str(tmp_path), ["embeddings"]).set_index(
        "vec_id"
    )
    c1 = np.uint64(np.int64(g.loc[1, "code"]))
    assert int(c1) & 1 == 1  # bit 0 set: perfectly aligned with plane 0
    # negation: bits of v and -v are disjoint (ties->0 on both sides)
    c2 = np.uint64(np.int64(g.loc[2, "code"]))
    assert int(c1) & int(c2) == 0
    assert int(g.loc[1, "n_bits"]) + int(g.loc[2, "n_bits"]) <= 64
    assert int(g.loc[3, "code"]) == 0 and int(g.loc[3, "n_bits"]) == 0


def test_segment_pivot_fill_and_total(tmp_path):
    _write(
        str(tmp_path), "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2], np.int64),
                "c_name": ["a", "b"],
                "c_nationkey": np.zeros(2, np.int32),
                "c_acctbal": np.zeros(2, np.float64),
                "c_mktsegment": ["BUILDING", "MACHINERY"],
            }
        ),
    )
    _write(
        str(tmp_path), "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([1, 2, 3], np.int64),
                "o_custkey": np.array([1, 2, 1], np.int64),
                "o_orderstatus": ["O"] * 3,
                "o_totalprice": np.array([10.0, 20.0, 5.0], np.float64),
                "o_orderdate": pd.to_datetime(
                    ["1996-01-05", "1996-01-20", "1996-02-01"]
                ).astype("datetime64[us]"),
                "o_orderpriority": ["1-URGENT"] * 3,
            }
        ),
    )
    g = _compare(
        "orders_segment_pivot", str(tmp_path), ["orders", "customer"]
    ).set_index("order_month")
    assert int(g.loc[199601, "building_micro"]) == 10_000_000
    assert int(g.loc[199601, "machinery_micro"]) == 20_000_000
    assert int(g.loc[199601, "automobile_micro"]) == 0  # fill 0
    assert int(g.loc[199601, "total_micro"]) == 30_000_000
    assert int(g.loc[199602, "total_micro"]) == 5_000_000
