"""Edge-case tests for wave-43 operators: run counting when a run crosses a
range boundary (the stitch must merge it) and KS on identical vs fully
disjoint half-distributions. Tiny adversarial tables run through BOTH the Ray
query and its DuckDB oracle."""

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


def _compare(name: str, sf_dir: str) -> pd.DataFrame:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def test_rle_run_crossing_range_boundary(tmp_path):
    # 64 rows, 32 ranges → 2 rows per range; ONE long 'view' run spanning all
    # ranges must count as a single run after stitching, then one flip.
    n = 64
    types = ["view"] * 48 + ["click"] * 16
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "user_id": np.ones(n, np.int64),
            "event_type": types,
            "value": np.ones(n),
            "props": ["{}"] * n,
        }
    ).assign(ts=lambda d: d.ts.astype("datetime64[us]"))
    _write(str(tmp_path), "events", df)
    g = _compare("events_rle_profile", str(tmp_path))
    m = {r.col: r for r in g.itertuples()}
    assert int(m["event_type"].n_runs) == 2
    assert int(m["event_type"].n_distinct) == 2
    assert int(m["event_type"].avg_run_micro) == 32_000_000
    assert int(m["user_id"].n_runs) == 1


def test_ks_identical_and_disjoint_halves(tmp_path):
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 1
    # 'same': identical value multiset in both halves → KS = 0
    for off, vals in [(0, [1.0, 2.0, 3.0]), (7200, [1.0, 2.0, 3.0])]:
        for v in vals:
            rows.append((eid, base + pd.Timedelta(seconds=off + eid), 1, "same", v))
            eid += 1
    # 'shift': halves fully disjoint → KS = 1
    for off, vals in [(0, [1.0, 1.0]), (7200, [9.0, 9.0])]:
        for v in vals:
            rows.append((eid, base + pd.Timedelta(seconds=off + eid), 1, "shift", v))
            eid += 1
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_ks_drift", str(tmp_path))
    m = dict(zip(g.event_type, g.ks_micro.astype(int)))
    assert m["same"] == 0
    assert m["shift"] == 1_000_000
