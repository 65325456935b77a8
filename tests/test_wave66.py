"""Edge-case tests for wave-66 operators: Q13 with a zero-order customer
(the left-join row naive pipelines drop) and peak detection with edge
maxima (never peaks), a below-mean local max (excluded), and a tallest-peak
tie (earliest hour wins). Ray vs DuckDB equality is enforced per-query by
the strict sweep; these pin analytic values on tiny adversarial tables."""

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


def test_q13_zero_order_customers(tmp_path):
    customer = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3, 4], np.int64),
            "c_name": ["a", "b", "c", "d"],
            "c_nationkey": np.zeros(4, np.int64),
            "c_acctbal": np.zeros(4, np.float64),
            "c_mktsegment": ["B"] * 4,
        }
    )
    # cust 1: 2 orders; cust 2: 1; cust 3: 1; cust 4: ZERO
    ok = [(1, 1), (2, 1), (3, 2), (4, 3)]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in ok], np.int64),
            "o_custkey": np.array([r[1] for r in ok], np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": np.ones(4, np.float64),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    _write(str(tmp_path), "customer", customer)
    _write(str(tmp_path), "orders", orders)
    g = _compare("q13_custdist", str(tmp_path), ["customer", "orders"]).set_index(
        "c_count"
    )
    assert int(g.loc[0, "n_customers"]) == 1  # the zero-order customer
    assert int(g.loc[1, "n_customers"]) == 2
    assert int(g.loc[2, "n_customers"]) == 1


def test_peak_hours_rules(tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    # counts per hour: [9, 1, 5, 1, 5, 1, 2]  (mean = 24/7 ≈ 3.43)
    # hour 0 is an edge -> never a peak; hours 2 and 4 are local maxima
    # above the mean and TIE at 5 -> earliest (hour 2) is the top peak
    counts = [9, 1, 5, 1, 5, 1, 2]
    rows = []
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append(base + pd.Timedelta(hours=h, minutes=i))
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(rows).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": ["a"] * n,
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_peak_hours", str(tmp_path), ["events"]).iloc[0]
    assert int(g.n_peaks) == 2
    base_hr = int(base.value // 10**9 // 3600)
    assert int(g.top_peak_hr) == base_hr + 2  # tie -> earliest
    assert int(g.top_peak_cnt) == 5
