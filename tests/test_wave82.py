"""Edge-case tests for wave-82 operators: activity streaks (multi-event days
count once, a gap of exactly one missing day splits the run, singleton
streaks) and perfect-order rate (the SLA boundary is inclusive, one late item
spoils the order, month rollup). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values on tiny adversarial
tables."""

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


def _events(rows):
    # rows: (user_id, ts)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], np.int64),
            "event_type": ["click"] * n,
            "value": np.ones(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_streaks_runs_gaps_and_dedup(tmp_path):
    ev = _events(
        [
            # user 1: days 1,2,3 then 5,6 -> streaks [3, 2]; day 2 twice
            (1, "2024-01-01 08:00"), (1, "2024-01-02 09:00"),
            (1, "2024-01-02 21:00"), (1, "2024-01-03 07:00"),
            (1, "2024-01-05 10:00"), (1, "2024-01-06 11:00"),
            # user 2: one day only
            (2, "2024-02-01 12:00"),
        ]
    )
    _write(str(tmp_path), "events", ev)
    g = _compare("events_streaks", str(tmp_path), ["events"]).set_index("user_id")
    assert int(g.loc[1, "n_active_days"]) == 5
    assert int(g.loc[1, "n_streaks"]) == 2
    assert int(g.loc[1, "longest_streak"]) == 3
    assert int(g.loc[2, "n_streaks"]) == 1
    assert int(g.loc[2, "longest_streak"]) == 1


def _orders(rows):
    n = len(rows)
    return pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.ones(n, np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.ones(n, np.float64),
            "o_orderdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )


def _lineitem(rows):
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_perfect_rate_boundary_and_spoiler(tmp_path):
    orders = _orders(
        [
            (1, "1996-01-10"),  # item at exactly +30 days -> perfect
            (2, "1996-01-20"),  # one on-time + one late item -> NOT perfect
            (3, "1996-02-05"),  # all on time -> perfect
        ]
    )
    li = _lineitem(
        [
            (1, "1996-02-09"),  # +30 exactly (inclusive)
            (2, "1996-01-25"),  # on time
            (2, "1996-04-01"),  # late -> spoils order 2
            (3, "1996-02-10"),
        ]
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "orders_perfect_rate", str(tmp_path), ["orders", "lineitem"]
    ).set_index("order_month")
    assert int(g.loc[199601, "n_orders"]) == 2
    assert int(g.loc[199601, "n_perfect"]) == 1
    assert int(g.loc[199601, "perfect_rate_micro"]) == 500_000
    assert int(g.loc[199602, "perfect_rate_micro"]) == 1_000_000
