"""Edge-case tests for wave-120 operators: encoding advisor (hand-built
cardinalities cross the 5% dictionary threshold exactly where expected;
value distincts are on rounded cents) and weekly periodicity (a strict
Monday-only user is flagged with the right day; one off-day event or too
few events suppresses the flag). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values."""

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
    # rows: (event_id, ts, user_id, event_type, value, props)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.array([r[4] for r in rows], np.float64),
            "props": [r[5] for r in rows],
        }
    )


def test_encoding_advisor_threshold(tmp_path):
    # 100 rows: event_type has 1 distinct (100 bp → dict); value has 50
    # distinct cents (5000 bp → plain); user_id 5 distinct (500 bp → dict,
    # AT the threshold); props 100 distinct (10000 bp → plain)
    rows = []
    for i in range(100):
        rows.append((i + 1, "2024-01-01", i % 5 + 1, "click",
                     (i % 50) + 0.01, f'{{"k": {i}}}'))
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_encoding_advisor", str(tmp_path), ["events"]).set_index(
        "col"
    )
    assert g.loc["event_type", "advice"] == "dict"
    assert int(g.loc["event_type", "n_distinct"]) == 1
    assert g.loc["user_id", "advice"] == "dict"  # exactly at 500 bp
    assert g.loc["value", "advice"] == "plain"
    assert int(g.loc["value", "n_distinct"]) == 50
    assert g.loc["props", "advice"] == "plain"


def test_weekly_periodicity_flags(tmp_path):
    mon = pd.Timestamp("2024-01-01")  # a Monday
    rows, k = [], 1
    # user 1: 4 Mondays → flagged, dow 0
    for w in range(4):
        rows.append((k, mon + pd.Timedelta(weeks=w), 1, "click", 1.0, "{}")); k += 1
    # user 2: 3 Mondays + 1 Tuesday → NOT flagged
    for w in range(3):
        rows.append((k, mon + pd.Timedelta(weeks=w), 2, "click", 1.0, "{}")); k += 1
    rows.append((k, mon + pd.Timedelta(days=1), 2, "click", 1.0, "{}")); k += 1
    # user 3: only 3 Mondays → below the event floor
    for w in range(3):
        rows.append((k, mon + pd.Timedelta(weeks=w), 3, "click", 1.0, "{}")); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_weekly_periodicity", str(tmp_path), ["events"])
    assert g["user_id"].tolist() == [1]
    assert int(g.loc[0, "dow"]) == 0  # Monday under the (day+4)%7 anchor
    assert int(g.loc[0, "n_events"]) == 4
