"""Edge-case tests for wave-83 operators: cohort LTV (year-boundary offsets,
distinct-active counting with multiple orders per month, cohort label from
the FIRST month) and feature hashing (same cross always lands in one bin;
counts re-reduce across batches; the bin matches a reference fnv1a32). Ray
vs DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod
from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32


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


def test_cohort_ltv_year_boundary(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 6, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2, 2], np.int64),
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": np.array([10.0, 20.0, 30.0, 5.0, 7.0], np.float64),
            "o_orderdate": pd.to_datetime(
                [
                    "1995-11-15",  # cust 1 cohort 199511, offset 0
                    "1995-11-20",  # same month: offset 0 again (one customer)
                    "1996-01-10",  # offset 2 across the year boundary
                    "1996-03-01",  # cust 2 cohort 199603, offset 0
                    "1996-04-01",  # offset 1
                ]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    _write(str(tmp_path), "orders", orders)
    g = _compare("customer_cohort_ltv", str(tmp_path), ["orders"]).set_index(
        ["cohort_month", "month_offset"]
    )
    assert int(g.loc[(199511, 0), "n_customers"]) == 1
    assert int(g.loc[(199511, 0), "revenue_micro"]) == 30_000_000
    assert int(g.loc[(199511, 2), "revenue_micro"]) == 30_000_000
    assert int(g.loc[(199603, 1), "revenue_micro"]) == 7_000_000


def test_feature_hashing_bin_and_cross_batch_sum(tmp_path):
    ts = pd.to_datetime(
        ["2024-01-01 17:30", "2024-01-02 17:45", "2024-01-01 03:00"]
    )
    ev = pd.DataFrame(
        {
            "event_id": np.arange(1, 4, dtype=np.int64),
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "user_id": np.array([1, 1, 1], np.int64),
            "event_type": ["click", "click", "view"],
            "value": np.ones(3, np.float64),
            "props": ["{}"] * 3,
        }
    )
    _write(str(tmp_path), "events", ev)
    g = _compare("events_feature_hashing", str(tmp_path), ["events"])
    bin_click17 = fnv1a32("click:17") % 64
    bin_view3 = fnv1a32("view:3") % 64
    m = {(int(r.user_id), int(r.bin)): int(r.n) for r in g.itertuples()}
    assert m[(1, bin_click17)] == 2  # both 17:xx clicks merge into one bin
    assert m[(1, bin_view3)] == 1
