"""Local replica of the driver's correctness gate: run every queries() entry and its
oracle_sql() through DuckDB on the same parquet tables, compare row count, schema
(column names) and order-insensitive values."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = normalize(to_pandas(qs[name](SF_DIR)))
    if name not in oracles:
        assert len(got) >= 0  # rows-only check (driver's weaker gate)
        return
    con = duck_con(SF_DIR)
    exp = normalize(con.execute(oracles[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name} columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} rows {len(got)} != {len(exp)}"
    for c in got.columns:
        ge = got[c].to_numpy()
        ee = exp[c].astype(got[c].dtype) if got[c].dtype != object else exp[c]
        ee_np = ee.to_numpy()
        eq = ge == ee_np
        if getattr(got[c].dtype, "kind", "") == "f":
            # NULL deltas (e.g. first event per key) are NaN on both sides;
            # NaN == NaN is False elementwise but the driver's hash (and the
            # strict sweep's DataFrame.equals) treats same-position NaNs equal.
            eq |= np.isnan(ge) & np.isnan(ee_np)
        assert eq.all(), f"{name}.{c}: first mismatch at {np.argmin(eq)}: {ge[np.argmin(eq)]!r} != {ee.to_numpy()[np.argmin(eq)]!r}"


def test_entry_smoke():
    ds = entrymod.entry()
    import ray.data

    assert isinstance(ds, ray.data.Dataset)
    assert ds.count() > 0


def test_empty_at_scale_queries_keep_typed_schema(tmp_path):
    """Regression for the round-5 sf0.1 smoke findings: queries whose result is
    legitimately EMPTY on a larger corpus must still return their typed frame —
    Ray drops the schema of an all-empty Dataset (even typed empty pandas
    blocks), so the query wrappers restore it explicitly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sts_opentelemetry_collector_ray.pipelines.queries95 import q_events_heavy_users
    from sts_opentelemetry_collector_ray.pipelines.queries67 import (
        q_events_interpolate_gaps,
    )

    # 200 users × 1 event each → nobody clears total/K (K=140); one event
    # per hour, no interior zero-hours → no gaps to fill
    n = 200
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(["click"] * n),
            "ts": pa.array(
                [1_700_000_000_000_000 + i * 3_600_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    heavy = q_events_heavy_users(str(tmp_path))
    assert len(heavy) == 0
    assert list(heavy.columns) == ["user_id", "cnt", "share_micro"]
    assert all(heavy[c].dtype == np.int64 for c in heavy.columns)

    gaps = q_events_interpolate_gaps(str(tmp_path))
    assert len(gaps) == 0
    assert list(gaps.columns) == ["event_type", "hr", "filled_micro"]
    assert gaps["event_type"].dtype == object
    assert gaps["hr"].dtype == np.int64


def test_lsh_eval_empty_pairs(tmp_path):
    """docs_lsh_eval with a corpus yielding zero LSH and zero exact pairs must
    return the 1-row all-zero metrics frame, not KeyError on the lost schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sts_opentelemetry_collector_ray.pipelines.queries87 import q_docs_lsh_eval

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "alpha beta gamma delta epsilon",
                "zeta eta theta iota kappa",
                "lambda mu nu xi omicron",
            ],
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_docs_lsh_eval(str(tmp_path))
    assert len(out) == 1
    assert out["n_lsh_pairs"].iloc[0] == 0
    assert out["n_exact_pairs"].iloc[0] == 0
    assert out["precision_micro"].iloc[0] == 0
