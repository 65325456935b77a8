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
