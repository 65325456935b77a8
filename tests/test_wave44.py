"""Edge-case tests for wave-44 operators: burn rate with an all-error window
(burn = 20×) and a tie between windows (earliest hour wins); apportionment
quotas sum EXACTLY to the budget and remainder ties break by type name. Tiny
adversarial tables run through BOTH the Ray query and its DuckDB oracle."""

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


def _mk(rows):
    return pd.DataFrame(
        {
            "event_id": np.arange(1, len(rows) + 1, dtype=np.int64),
            "ts": pd.Series([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        }
    )


def test_burn_rate_all_error_window_and_tie(tmp_path):
    h0 = pd.Timestamp("2024-01-01 00:30")
    h1 = pd.Timestamp("2024-01-01 01:30")
    h2 = pd.Timestamp("2024-01-01 02:30")
    rows = [
        # user 1, hour 0: 2/2 errors → burn 20.0; hour 1: 1/2 → 10.0
        (h0, 1, "error"), (h0, 1, "error"),
        (h1, 1, "error"), (h1, 1, "view"),
        # user 2: hours 1 and 2 both 1/1 errors → tie, earliest hour wins
        (h1, 2, "error"), (h2, 2, "error"),
    ]
    _write(str(tmp_path), "events", _mk(rows))
    g = _compare("events_burn_rate", str(tmp_path))
    m = {int(r.user_id): r for r in g.itertuples()}
    assert int(m[1].worst_burn_micro) == 20_000_000
    assert int(m[1].n_hours) == 2
    h1_epoch = int(h1.value // 10**9 // 3600)
    assert int(m[2].worst_hour) == h1_epoch  # earliest of the tied windows


def test_quotas_sum_to_budget(tmp_path):
    # counts 3/3/1 over budget 1000: base = 428/428/142 (floor 1000·n/7),
    # remainders 4/4/6 → leftover 2 goes to 'a','b'?? remainder of c is
    # larger → c gets one, then tie a vs b → 'a' wins the last seat.
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for ty, k in [("a", 3), ("b", 3), ("c", 1)]:
        for _ in range(k):
            rows.append((t0, 1, ty))
    _write(str(tmp_path), "events", _mk(rows))
    g = _compare("events_sample_quotas", str(tmp_path))
    q = dict(zip(g.event_type, g.quota.astype(int)))
    assert sum(q.values()) == 1000
    assert q["c"] == 143  # largest remainder first
    assert q["a"] == 429 and q["b"] == 428  # tie broken by type ASC
