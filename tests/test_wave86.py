"""Edge-case tests for wave-86 operators: sequential pairs (same-day orders
never pair, direction matters, a customer counts once per pair even with
repeat sequences) and JL distortion (a vector aligned with one sign-row
inflates; the all-zero guard; exact ratio pinned for a crafted vector). Ray
vs DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod
from sts_opentelemetry_collector_ray.pipelines.queries86 import (
    _JL_K,
    _JL_SCALE,
    _jl_signs,
)


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


def test_sequential_pairs_direction_and_dedup(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 6, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2, 2], np.int64),
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": np.ones(5, np.float64),
            "o_orderdate": pd.to_datetime(
                [
                    "2024-01-01",  # cust 1: part 10
                    "2024-01-05",  # cust 1: part 20 (later)
                    "2024-01-09",  # cust 1: part 20 again (dedup per pair)
                    "2024-02-01",  # cust 2: parts 10, 20 SAME DAY (no pair)
                    "2024-02-10",  # cust 2: part 30
                ]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2, 3, 4, 4, 5], np.int64),
            "l_partkey": np.array([10, 20, 20, 10, 20, 30], np.int64),
            "l_suppkey": np.ones(6, np.int64),
            "l_linenumber": np.arange(1, 7, dtype=np.int64),
            "l_quantity": np.ones(6, np.float64),
            "l_extendedprice": np.ones(6, np.float64),
            "l_discount": np.zeros(6, np.float64),
            "l_tax": np.zeros(6, np.float64),
            "l_returnflag": ["N"] * 6,
            "l_linestatus": ["O"] * 6,
            "l_shipdate": pd.to_datetime(["2024-03-01"] * 6).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "orders_sequential_pairs", str(tmp_path), ["orders", "lineitem"]
    )
    m = {(int(r.part_a), int(r.part_b)): int(r.n_customers) for r in g.itertuples()}
    assert m[(10, 20)] == 1  # cust 1 only (counted once despite two sequels)
    assert m[(10, 30)] == 1 and m[(20, 30)] == 1  # cust 2 same-day→later
    assert (20, 10) not in m  # direction matters; same-day never pairs


def test_jl_distortion_crafted_vector(tmp_path):
    S = _jl_signs()
    # vector = first sign row / scale -> y_0 = 64·2^14·?; exact ratio known
    v0 = (S[0].astype(np.float64)) * (1.0 / 4.0)
    q = np.floor(v0 * _JL_SCALE + 0.5).astype(np.int64)
    y = q @ S.T
    spx, sx = int((y * y).sum()), int((q * q).sum())
    expect = (spx * 1_000_000) // (_JL_K * sx)
    t = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([v0.astype(np.float32).tolist()],
                                  pa.list_(pa.float32())),
            "label": pa.array([0], pa.int32()),
        }
    )
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t.replace_schema_metadata(None), f"{tmp_path}/embeddings.parquet")
    g = _compare("emb_jl_distortion", str(tmp_path), ["embeddings"])
    assert int(g.loc[0, "mean_ratio_micro"]) == expect
    assert int(g.loc[0, "min_ratio_micro"]) == expect
    # alignment with a sign row concentrates mass: ratio well above 1.0
    assert expect > 1_000_000
