"""Edge-case tests for wave-40 operators: counter rate across a reset (drop
counts the new value fully), a single-sample series (NULL rate), and a
timestamp tie; skyline with duplicate frontier points and a dominated-on-tie
point. Tiny adversarial tables run through BOTH the Ray query and its DuckDB
oracle."""

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


def test_counter_rate_reset_and_single_sample(tmp_path):
    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1 'view': 10 → 30 (+20) → 5 (RESET: +5) → 15 (+10) = 35.00
        (1, 1, "view", 0, 10.0),
        (2, 1, "view", 10, 30.0),
        (3, 1, "view", 20, 5.0),
        (4, 1, "view", 30, 15.0),
        # user 2 'view': single sample → NULL rate, increase 0
        (5, 2, "view", 0, 99.0),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series(
                [base + pd.Timedelta(seconds=r[3]) for r in rows]
            ).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_counter_rate", str(tmp_path), ["events"])
    m = {int(r.user_id): r for r in g.itertuples()}
    assert int(m[1].increase_cents) == 3500
    assert int(m[1].span_us) == 30_000_000
    # 35.00 units over 30 s → 1.166667 u/s → 1166667 micro
    assert int(m[1].rate_micro) == 1_166_667
    assert int(m[2].increase_cents) == 0 and np.isnan(m[2].rate_micro)


def test_skyline_duplicates_and_tie_domination(tmp_path):
    d = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-02", "2024-01-01", "2024-01-03"]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            # orders 2 and 3: identical frontier point (both survive);
            # order 4: same price as 2/3 but older date → dominated;
            # order 5: lower price but newest date → survives;
            # order 1: dominated by everything newer/richer.
            "o_orderkey": np.array([1, 2, 3, 4, 5], np.int64),
            "o_custkey": np.ones(5, np.int64),
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": [50.0, 100.0, 100.0, 100.0, 80.0],
            "o_orderdate": d,
            "o_orderpriority": ["1"] * 5,
        }
    )
    _write(str(tmp_path), "orders", df)
    g = _compare("orders_skyline", str(tmp_path), ["orders"])
    assert sorted(g.o_orderkey.astype(int)) == [2, 3, 5]
