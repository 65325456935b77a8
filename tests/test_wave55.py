"""Edge-case tests for wave-55 operators: the fixed-point EWMA recurrence on
a hand-computed 3-hour series (including a zero-filled gap hour) and MAD
anomaly counts on degenerate (MAD = 0) and regular tiny distributions. Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin analytic
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
    # rows: (ts_iso, event_type, value)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [r[1] for r in rows],
            "value": np.array([r[2] for r in rows], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_ewma_hand_computed_with_gap(tmp_path):
    # type 'a': 2 events in hour 0, none in hour 1 (gap), 1 event in hour 2
    # s0 = 2e6; s1 = (0 + 7*2e6)//10 = 1_400_000
    # s2 = (3*1e6 + 7*1_400_000)//10 = (3_000_000 + 9_800_000)//10 = 1_280_000
    rows = [
        ("2024-01-01 00:10:00", "a", 0.0),
        ("2024-01-01 00:20:00", "a", 0.0),
        ("2024-01-01 02:30:00", "a", 0.0),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_ewma", str(tmp_path), ["events"]).iloc[0]
    assert int(g.ewma_fp6) == 1_280_000
    assert int(g.last_cnt) == 1
    assert int(g.n_hours) == 3


def test_mad_degenerate_zero_mad(tmp_path):
    # four identical values and one spike: med=100, MAD=0 -> any deviation
    # is an anomaly under the integer rule (d*1e4 > 44478*0)
    rows = [("2024-01-01", "a", v) for v in (1.0, 1.0, 1.0, 1.0, 100.0)]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_mad_anomaly", str(tmp_path), ["events"]).iloc[0]
    assert (int(g.med_cents), int(g.mad_cents)) == (100, 0)
    assert int(g.n_anomalies) == 1 and int(g.n) == 5


def test_mad_regular_distribution(tmp_path):
    # cents [10,20,30,40,1000]: med=30, deviations sorted [0,10,10,20,970],
    # MAD=10; cutoff d > 4.4478*10 -> only 970 flags
    rows = [("2024-01-01", "a", v) for v in (0.10, 0.20, 0.30, 0.40, 10.0)]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_mad_anomaly", str(tmp_path), ["events"]).iloc[0]
    assert (int(g.med_cents), int(g.mad_cents)) == (30, 10)
    assert int(g.n_anomalies) == 1
