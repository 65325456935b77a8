"""Edge-case tests for wave-106 operators: account sharing (two mirrored
users form a cohort even when one has duplicate events inside a minute; a
user who is a strict SUBSET does not match; unique users are suppressed)
and KPI tree (the three floored contributions telescope to the exact WoW
delta on a hand-built two-week table, including a negative-delta week that
exercises the floor-vs-truncate offset). Ray vs DuckDB equality is enforced
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
    # rows: (event_id, ts, user_id, value)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": ["click"] * n,
            "value": np.array([r[3] for r in rows], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_account_sharing_exact_fingerprints(tmp_path):
    rows = [
        # users 1 and 2 mirror each other at minutes 10:00 and 10:05;
        # user 1 has TWO events inside 10:00 (distinct-minute set unchanged)
        (1, "2024-01-01 10:00:05", 1, 1.0),
        (2, "2024-01-01 10:00:45", 1, 1.0),
        (3, "2024-01-01 10:05:00", 1, 1.0),
        (4, "2024-01-01 10:00:30", 2, 1.0),
        (5, "2024-01-01 10:05:59", 2, 1.0),
        # user 3 is a strict subset (only 10:00) — NOT in the cohort
        (6, "2024-01-01 10:00:10", 3, 1.0),
        # user 4 unique pattern
        (7, "2024-01-01 22:00:00", 4, 1.0),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_account_sharing", str(tmp_path), ["events"]).set_index(
        "user_id"
    )
    assert sorted(g.index) == [1, 2]
    assert int(g.loc[1, "cohort_size"]) == 2
    assert int(g.loc[1, "n_minutes"]) == 2


def test_kpi_tree_telescoping(tmp_path):
    rows, k = [], 1
    # window 1 (days mx-13..mx-7): 2 users, 4 events, 400.00 total
    for d in ("2024-01-01", "2024-01-02"):
        rows.append((k, d, 1, 100.0)); k += 1
        rows.append((k, d, 2, 100.0)); k += 1
    # window 2 (days mx-6..mx): 3 users, 3 events, 150.00 total (DOWN week)
    for u in (1, 2, 3):
        rows.append((k, "2024-01-10", u, 50.0)); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_kpi_tree", str(tmp_path), ["events"])
    v1, v2 = int(g.loc[0, "v1_cents"]), int(g.loc[0, "v2_cents"])
    assert (v1, v2) == (40_000, 15_000)
    assert int(g.loc[0, "delta_cents"]) == -25_000
    from fractions import Fraction

    u1, e1, u2, e2 = 2, 4, 3, 3
    c_u = (u2 - u1) * Fraction(v1, u1)
    c_epu = (Fraction(e2, u2) - Fraction(e1, u1)) * u2 * Fraction(v1, e1)
    c_vpe = (Fraction(v2, e2) - Fraction(v1, e1)) * e2
    assert c_u + c_epu + c_vpe == v2 - v1  # exact telescoping
    for col, fr in (
        ("c_users_micro", c_u),
        ("c_epu_micro", c_epu),
        ("c_vpe_micro", c_vpe),
    ):
        assert int(g.loc[0, col]) == (fr.numerator * 1_000_000) // fr.denominator
