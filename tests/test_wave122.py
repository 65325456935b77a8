"""Edge-case tests for wave-122 operators: day-part window (a value mass
split across midnight is found by the circular scan; ties resolve to the
earliest start) and escalation rate (a clean DEBUG→WARN→ERROR climb counts;
a dip resets eligibility; flat-ERROR conversations don't count — no strict
increase). Ray vs DuckDB equality is enforced per-query by the strict
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
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.array([r[4] for r in rows], np.float64),
            "props": ['{"k": 1}'] * len(rows),
        }
    )


def test_daypart_crosses_midnight(tmp_path):
    rows, k = [], 1
    # 'click': value only at hours 22, 23, 0, 1 → best 8h window must wrap;
    # earliest maximal start is 18 (covers 18..01)
    for h in (22, 23):
        rows.append((k, f"2024-01-01 {h:02d}:00", 1, "click", 25.0)); k += 1
    for h in (0, 1):
        rows.append((k, f"2024-01-02 {h:02d}:00", 1, "click", 25.0)); k += 1
    rows.append((k, "2024-01-01 12:00", 1, "click", 4.0)); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_daypart_window", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["click", "start_hour"]) == 18
    assert int(g.loc["click", "window_cents"]) == 10_000
    assert int(g.loc["click", "share_bp"]) == 10_000 * 10_000 // 10_400


def test_escalation_patterns(tmp_path):
    rows = [
        # user 1: click(DEBUG) → view(WARN) → error(ERROR): clean climb ✓
        (1, "2024-01-01 09:00", 1, "click", 1.0),
        (2, "2024-01-01 09:10", 1, "view", 1.0),
        (3, "2024-01-01 09:20", 1, "error", 1.0),
        # user 2: view(WARN) → click(DEBUG) → error(ERROR): dips ✗
        (4, "2024-01-01 09:00", 2, "view", 1.0),
        (5, "2024-01-01 09:10", 2, "click", 1.0),
        (6, "2024-01-01 09:20", 2, "error", 1.0),
        # user 3: error → error: flat, no strict increase ✗
        (7, "2024-01-01 09:00", 3, "error", 1.0),
        (8, "2024-01-01 09:10", 3, "error", 1.0),
        # user 4: climbs but ends on WARN ✗
        (9, "2024-01-01 09:00", 4, "click", 1.0),
        (10, "2024-01-01 09:10", 4, "view", 1.0),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("conv_escalation_rate", str(tmp_path), ["events"])
    assert int(g.loc[0, "n_convs"]) == 4
    assert int(g.loc[0, "n_escalating"]) == 1
    assert int(g.loc[0, "share_bp"]) == 2_500
