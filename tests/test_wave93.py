"""Edge-case tests for wave-93 operators: DiD (a planted post-cutoff lift in
the treatment type with flat control recovers exactly; zero-count days pull
the means) and LOCF (carried values hold across multi-day gaps, a
same-day later event wins, the series starts at the type's first day). Ray
vs DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

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


def test_did_planted_lift(tmp_path):
    rows, k = [], 1
    # 4 pre days (1998-06-27..30) and 4 post days (1998-07-01..04).
    # click: 2/day pre, 5/day post (lift +3). view: 3/day throughout.
    for d in ("1998-06-27", "1998-06-28", "1998-06-29", "1998-06-30"):
        for _ in range(2):
            rows.append((k, d + " 10:00", "click", 1.0)); k += 1
        for _ in range(3):
            rows.append((k, d + " 11:00", "view", 1.0)); k += 1
    for d in ("1998-07-01", "1998-07-02", "1998-07-03", "1998-07-04"):
        for _ in range(5):
            rows.append((k, d + " 10:00", "click", 1.0)); k += 1
        for _ in range(3):
            rows.append((k, d + " 11:00", "view", 1.0)); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_diff_in_diff", str(tmp_path), ["events"])
    assert int(g.loc[0, "t_pre_micro"]) == 2_000_000
    assert int(g.loc[0, "t_post_micro"]) == 5_000_000
    assert int(g.loc[0, "c_pre_micro"]) == 3_000_000
    assert int(g.loc[0, "c_post_micro"]) == 3_000_000
    assert int(g.loc[0, "did_micro"]) == 3_000_000


def test_locf_gap_carry_and_same_day_last(tmp_path):
    rows = [
        (1, "2024-01-01 09:00", "click", 10.0),
        (2, "2024-01-01 18:00", "click", 12.0),  # same day, later -> wins
        (3, "2024-01-04 08:00", "click", 20.0),  # 2-day gap carried
        (4, "2024-01-05 08:00", "view", 7.0),  # other type starts later
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_locf_daily", str(tmp_path), ["events"]).set_index(
        ["event_type", "day"]
    )
    d0 = int(pd.Timestamp("2024-01-01").timestamp() // 86400)
    assert int(g.loc[("click", d0), "value_cents"]) == 1200  # later same-day
    assert int(g.loc[("click", d0), "is_carried"]) == 0
    assert int(g.loc[("click", d0 + 1), "value_cents"]) == 1200  # carried
    assert int(g.loc[("click", d0 + 1), "is_carried"]) == 1
    assert int(g.loc[("click", d0 + 3), "value_cents"]) == 2000
    # view exists only from its first day (the global max day)
    assert ("view", d0) not in g.index
    assert int(g.loc[("view", d0 + 4), "value_cents"]) == 700
    # click extends to the global max day (2024-01-05)
    assert int(g.loc[("click", d0 + 4), "value_cents"]) == 2000
