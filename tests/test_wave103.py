"""Edge-case tests for wave-103 operators: repeat latency (the SECOND order
defines the gap even when later orders are closer together; single-order
customers are excluded; same-day repeat counts at every threshold) and
power sizing (zero-variance types need 0 samples; a hand-built two-point
distribution recovers the closed-form 6400·σ²·n²/S² ceiling). Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic
values."""

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


def test_repeat_latency_second_order_rule(tmp_path):
    rows = [
        # cust 1: first 01-01, second 01-09 (gap 8) — later pair closer
        (1, 1, "2024-01-01"), (2, 1, "2024-01-09"), (3, 1, "2024-01-10"),
        # cust 2: same-day repeat (gap 0)
        (4, 2, "2024-03-01"), (5, 2, "2024-03-01"),
        # cust 3: single order — excluded
        (6, 3, "2024-04-01"),
        # cust 4: gap 45 — inside 60 but outside 30
        (7, 4, "2024-05-01"), (8, 4, "2024-06-15"),
    ]
    _write(str(tmp_path), "orders", pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.array([r[1] for r in rows], np.int64),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": np.zeros(len(rows)),
            "o_orderdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        },
    ))
    g = _compare("customer_repeat_latency", str(tmp_path), ["orders"]).set_index(
        "threshold_days"
    )
    assert (g["n_multi"] == 3).all()  # custs 1, 2, 4
    assert int(g.loc[7, "n_within"]) == 1    # only the same-day repeat
    assert int(g.loc[30, "n_within"]) == 2   # + cust 1's gap of 8
    assert int(g.loc[60, "n_within"]) == 3   # + cust 4's gap of 45
    assert int(g.loc[30, "share_bp"]) == 2 * 10_000 // 3


def test_power_sizing_closed_forms(tmp_path):
    rows = []
    # 'click': constant value → σ²=0 → required 0
    for i in range(4):
        rows.append((i + 1, "click", 2.0))
    # 'view': half 1.00, half 3.00 cents=100/300 → n=4, S=800, S2=200000
    # a = 6400·(4·200000 − 640000) = 6400·160000; b = 640000 → exactly 1600
    for i in range(2):
        rows.append((10 + i, "view", 1.0))
        rows.append((20 + i, "view", 3.0))
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)).astype(
                "datetime64[us]"
            ),
            "user_id": np.ones(len(rows), np.int64),
            "event_type": [r[1] for r in rows],
            "value": np.array([r[2] for r in rows], np.float64),
            "props": ["{}"] * len(rows),
        },
    ))
    g = _compare("events_power_sizing", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["click", "required_per_arm"]) == 0
    assert int(g.loc["click", "mean_cents"]) == 200
    assert int(g.loc["view", "required_per_arm"]) == 1600
    assert int(g.loc["view", "mean_cents"]) == 200
