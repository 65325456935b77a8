"""Edge-case tests for wave-91 operators: Tukey fences (hand-computed
quartiles on a small histogram, a planted extreme outlier counts, boundary
values at the fence are NOT outliers — strict inequality) and daily TWAP (a
value holding most of the day dominates the average; last-event tail runs to
day end; equal-timestamp steps contribute zero). Ray vs DuckDB equality is
enforced per-query by the strict sweep; these pin analytic values on tiny
adversarial tables."""

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
    # rows: (event_id, ts, event_type, value)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.array([r[3] for r in rows], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_tukey_quartiles_and_strict_fences(tmp_path):
    # values 1..8 (cents 100..800): n=8, rank Q1=ceil(8/4)=2 -> 200,
    # Q3=ceil(24/4)=6 -> 600; IQR=400; lo=200-600=-400, hi=600+600=1200.
    # add 13.0 (1300 > 1200: outlier) and 12.0 (1200 == fence: NOT outlier).
    rows = [(i, f"2024-01-01 0{i}:00", "click", float(i)) for i in range(1, 9)]
    rows += [(9, "2024-01-01 09:00", "click", 13.0),
             (10, "2024-01-01 10:00", "click", 12.0)]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_tukey_fences", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    # with the two extra rows n=10: Q1 rank ceil(10/4)=3 -> 300,
    # Q3 rank ceil(30/4)=8 -> 800; IQR 500; hi = 800+750=1550 -> no outliers!
    # recompute: lo = 300-750 = -450. 1300 < 1550 -> inside. So n_high=0.
    assert int(g.loc["click", "n"]) == 10
    assert int(g.loc["click", "q1_cents"]) == 300
    assert int(g.loc["click", "q3_cents"]) == 800
    assert int(g.loc["click", "n_low"]) == 0
    assert int(g.loc["click", "n_high"]) == 0


def test_tukey_planted_outlier(tmp_path):
    # tight cluster at 5.0 (x20) with one 50.0: IQR 0 -> fences at 500;
    # 5000 > 500 strict -> one high outlier.
    rows = [(i, f"2024-01-01 00:{i:02d}", "view", 5.0) for i in range(20)]
    rows.append((99, "2024-01-01 01:00", "view", 50.0))
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_tukey_fences", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["view", "q1_cents"]) == 500
    assert int(g.loc["view", "q3_cents"]) == 500
    assert int(g.loc["view", "n_high"]) == 1
    assert int(g.loc["view", "n_low"]) == 0


def test_twap_step_integration(tmp_path):
    # type 'click', one day: value 10 from 00:00 to 12:00 (half day),
    # then 20 from 12:00 to day end -> TWAP = 15.0 exactly.
    rows = [
        (1, "2024-01-01 00:00:00", "click", 10.0),
        (2, "2024-01-01 12:00:00", "click", 20.0),
        # equal-ts pair: eid 3 holds zero time, eid 4 takes the tail
        (3, "2024-01-02 00:00:00", "view", 100.0),
        (4, "2024-01-02 00:00:00", "view", 40.0),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_twap_daily", str(tmp_path), ["events"]).set_index(
        ["event_type", "day"]
    )
    day0 = int(pd.Timestamp("2024-01-01").timestamp() // 86400)
    assert int(g.loc[("click", day0), "twap_micro"]) == 15_000_000
    assert int(g.loc[("click", day0), "dur_us"]) == 86_400_000_000
    # view day: eid 3 contributes 0 time; TWAP = 40.0
    assert int(g.loc[("view", day0 + 1), "twap_micro"]) == 40_000_000
    assert int(g.loc[("view", day0 + 1), "n_events"]) == 2
