"""Edge-case tests for wave-99 operators: split shipments (same-day
multi-line orders do NOT count as split; the month key comes from the ORDER
date, not the ship dates; exact basis-point floor) and schedule affinity
(a user matching the global profile shape scores 1.0; a user concentrated
in a single off-peak hour scores the hand-computed cosine; boundary hours
wrap at 168). Ray vs DuckDB equality is enforced per-query by the strict
sweep; these pin analytic values."""

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


def test_split_shipments_month_and_sameday(tmp_path):
    d = str(tmp_path)
    _write(d, "orders", pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], np.int64),
            "o_custkey": np.ones(3, np.int64),
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": np.zeros(3),
            # order 3 is placed in Jan but ships in Feb → counted in Jan
            "o_orderdate": pd.to_datetime(
                ["2024-01-10", "2024-01-20", "2024-01-31"]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 3,
        },
    ))
    li = [
        (1, "2024-01-11"), (1, "2024-01-11"),  # 2 lines, same day → NOT split
        (2, "2024-01-21"), (2, "2024-01-25"),  # 2 days → split
        (3, "2024-02-05"), (3, "2024-02-09"),  # split, Feb ships, Jan order
    ]
    n = len(li)
    _write(d, "lineitem", pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in li], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.ones(n),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[1] for r in li]).astype("datetime64[us]"),
        },
    ))
    g = _compare("orders_split_shipments", d, ["orders", "lineitem"]).set_index(
        "order_month"
    )
    jan = (2024 - 1970) * 12 + 0
    assert int(g.loc[jan, "n_orders"]) == 3  # all three ordered in Jan
    assert int(g.loc[jan, "n_split"]) == 2   # orders 2 and 3
    assert int(g.loc[jan, "split_bp"]) == 2 * 10_000 // 3
    assert len(g) == 1  # no Feb row: month keys off the order date


def test_schedule_affinity_shape_match_and_outlier(tmp_path):
    # user 1 dominates the corpus, so the global profile takes their shape;
    # user 2 sits entirely in user 1's MINOR hour → off-pattern
    rows, k = [], 1
    # (hours after epoch: the weekday anchor is irrelevant — both sides use
    # the same (ts//h)%168)
    base = pd.Timestamp("1970-01-01")
    for _ in range(30):
        rows.append((k, base + pd.Timedelta(hours=10), 1)); k += 1
    for _ in range(10):
        rows.append((k, base + pd.Timedelta(hours=20), 1)); k += 1
    # user 2: 4 events all at how=20 (one week later, same bin)
    for _ in range(4):
        rows.append((k, base + pd.Timedelta(hours=20 + 168), 2)); k += 1
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": ["click"] * len(rows),
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        },
    ))
    g = _compare("events_schedule_affinity", str(tmp_path), ["events"]).set_index(
        "user_id"
    )
    # global: how10=30, how20=14. user1=(30,10), user2=(0,4)
    exp1 = (30 * 30 + 10 * 14) / (np.sqrt(1000.0) * np.sqrt(1096.0))
    assert abs(float(g.loc[1, "cos_sim"]) - exp1) < 2e-6
    exp2 = (4 * 14) / (4.0 * np.sqrt(1096.0))
    assert abs(float(g.loc[2, "cos_sim"]) - exp2) < 2e-6
    assert int(g.loc[1, "n_events"]) == 40 and int(g.loc[2, "n_events"]) == 4
    # the minor-hour-only user is far less typical than the dominant one
    assert float(g.loc[2, "cos_sim"]) < 0.5 < float(g.loc[1, "cos_sim"])
