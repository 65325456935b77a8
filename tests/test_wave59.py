"""Edge-case tests for wave-59 operators: bot regularity on a metronome user
(CV² exactly 0, flagged) vs a geometric-gap user (not flagged) plus a
too-short journey; Markov stationary distribution on a 2-cycle (uniform
fixed point) and an absorbing chain (all mass drains). Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic
values on tiny adversarial tables."""

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
    # rows: (ts_iso, user_id, event_type)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_bot_regularity_metronome_vs_bursty(tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1: 7 events exactly 60 s apart -> 6 gaps, CV^2 = 0 -> flagged
    for i in range(7):
        rows.append((base + pd.Timedelta(seconds=60 * i), 1, "view"))
    # user 2: geometric gaps 1,2,4,8,16,32 s -> CV^2 >> 0.1 -> not flagged
    t = base
    rows.append((t, 2, "view"))
    for gap in (1, 2, 4, 8, 16, 32):
        t = t + pd.Timedelta(seconds=gap)
        rows.append((t, 2, "view"))
    # user 3: only 3 events -> 2 gaps -> not scored
    for i in range(3):
        rows.append((base + pd.Timedelta(seconds=i), 3, "view"))
    df = _events([(str(r[0]), r[1], r[2]) for r in rows])
    _write(str(tmp_path), "events", df)
    g = _compare("events_bot_regularity", str(tmp_path), ["events"]).iloc[0]
    assert int(g.n_scored) == 2
    assert int(g.n_flagged) == 1
    assert int(g.min_cv2_micro) == 0


def test_markov_two_cycle_uniform(tmp_path):
    # a -> b -> a -> b -> a: symmetric 2-cycle; uniform is the fixed point
    rows = [
        ("2024-01-01 00:00:00", 1, "a"),
        ("2024-01-01 00:00:01", 1, "b"),
        ("2024-01-01 00:00:02", 1, "a"),
        ("2024-01-01 00:00:03", 1, "b"),
        ("2024-01-01 00:00:04", 1, "a"),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_markov_stationary", str(tmp_path), ["events"]).set_index(
        "state"
    )
    assert int(g.loc["a", "stationary_int"]) == 500_000_000_000
    assert int(g.loc["b", "stationary_int"]) == 500_000_000_000


def test_markov_absorbing_state_drains(tmp_path):
    # single transition a -> b; b has no outgoing edges -> self-loops;
    # after one step all of a's mass is in b and stays there
    rows = [
        ("2024-01-01 00:00:00", 1, "a"),
        ("2024-01-01 00:00:01", 1, "b"),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_markov_stationary", str(tmp_path), ["events"]).set_index(
        "state"
    )
    assert int(g.loc["a", "stationary_int"]) == 0
    assert int(g.loc["b", "stationary_int"]) == 1_000_000_000_000
