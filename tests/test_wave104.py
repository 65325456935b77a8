"""Edge-case tests for wave-104 operators: PIT join (an event AT a change
boundary takes the interval that starts there; events between changes take
the prior status; versions number per user) and LOO target encoding (the
self-row is excluded exactly; singleton categories fall back to the global
LOO mean). Ray vs DuckDB equality is enforced per-query by the strict
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


def _events(rows):
    # rows: (event_id, ts, user_id, event_type, value)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.array([r[4] for r in rows], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_scd2_pit_boundaries_and_versions(tmp_path):
    rows = [
        (1, "2024-01-01 09:00", 7, "free", 1.0),
        (2, "2024-01-02 09:00", 7, "free", 1.0),   # within v1
        (3, "2024-01-03 09:00", 7, "pro", 1.0),    # starts v2 AT its own ts
        (4, "2024-01-04 09:00", 7, "pro", 1.0),
        (5, "2024-01-05 09:00", 7, "free", 1.0),   # v3
        (6, "2024-01-01 00:00", 8, "solo", 1.0),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_scd2_pit", str(tmp_path), ["events"]).set_index("event_id")
    assert g.loc[1, "status_at"] == "free" and int(g.loc[1, "status_version"]) == 1
    assert g.loc[2, "status_at"] == "free" and int(g.loc[2, "status_version"]) == 1
    # the change event itself belongs to the interval it opens
    assert g.loc[3, "status_at"] == "pro" and int(g.loc[3, "status_version"]) == 2
    assert g.loc[4, "status_at"] == "pro"
    assert g.loc[5, "status_at"] == "free" and int(g.loc[5, "status_version"]) == 3
    assert g.loc[6, "status_at"] == "solo" and int(g.loc[6, "status_version"]) == 1
    assert len(g) == 6  # every event matched exactly once


def test_target_encoding_loo_and_singleton(tmp_path):
    rows = [
        (1, "2024-01-01", 1, "click", 1.0),   # cents 100
        (2, "2024-01-01", 1, "click", 2.0),   # cents 200
        (3, "2024-01-01", 1, "click", 3.0),   # cents 300
        (4, "2024-01-01", 1, "view", 9.0),    # singleton → global fallback
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_target_encoding", str(tmp_path), ["events"]).set_index(
        "event_id"
    )
    # click S=600: LOO of row1 = (600−100)/2 = 250 cents
    assert int(g.loc[1, "loo_micro"]) == 250_000_000
    assert int(g.loc[2, "loo_micro"]) == 200_000_000
    assert int(g.loc[3, "loo_micro"]) == 150_000_000
    # view singleton: global S=1500 → (1500−900)/3 = 200 cents
    assert int(g.loc[4, "loo_micro"]) == 200_000_000
