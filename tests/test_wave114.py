"""Edge-case tests for wave-114 operators: memo hit rate (the same arg in
the same conversation is a hit; the same arg across DIFFERENT conversations
is not; tools with no repeats score zero) and drawdown (a planted
rise-crash-recover series recovers the exact collapse and its earliest
trough day; a monotone series has zero drawdown). Ray vs DuckDB equality is
enforced per-query by the strict sweep; these pin analytic values."""

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
    # rows: (event_id, ts, user_id, event_type, props)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(n, np.float64),
            "props": [r[4] for r in rows],
        }
    )


def test_memo_hits_same_conv_only(tmp_path):
    rows = [
        # user 5 (one conversation): search(q1) twice + search(q2) → 1 hit
        (1, "2024-01-01 10:00", 5, "purchase", '{"k": 1}'),
        (2, "2024-01-01 10:01", 5, "purchase", '{"k": 1}'),
        (3, "2024-01-01 10:02", 5, "purchase", '{"k": 2}'),
        # user 6: search(q1) once — same arg, DIFFERENT conv → no hit
        (4, "2024-01-01 11:00", 6, "purchase", '{"k": 1}'),
        # user 5: bash(q7) once (error event) → zero-hit tool
        (5, "2024-01-01 12:00", 5, "error", '{"k": 7}'),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("tools_memo_hit_rate", str(tmp_path), ["events"]).set_index("tool")
    assert int(g.loc["search", "n_calls"]) == 4
    assert int(g.loc["search", "n_hits"]) == 1
    assert int(g.loc["search", "hit_bp"]) == 10_000 // 4
    assert int(g.loc["bash", "n_hits"]) == 0


def test_drawdown_crash_and_monotone(tmp_path):
    rows, k = [], 1
    # 'click' daily counts: 2, 5, 1, 1, 4 → peak 5, trough 1 (first at day 3)
    for d, n in (("2024-01-01", 2), ("2024-01-02", 5), ("2024-01-03", 1),
                 ("2024-01-04", 1), ("2024-01-05", 4)):
        for _ in range(n):
            rows.append((k, d + " 10:00", 1, "click", "{}")); k += 1
    # 'view': monotone 1, 2, 3 → zero drawdown, trough = first day
    for d, n in (("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)):
        for _ in range(n):
            rows.append((k, d + " 10:00", 1, "view", "{}")); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_drawdown", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    d0 = int(pd.Timestamp("2024-01-01").timestamp() // 86400)
    assert int(g.loc["click", "max_drawdown"]) == 4
    assert int(g.loc["click", "trough_day"]) == d0 + 2  # earliest of the two
    assert int(g.loc["click", "peak_count"]) == 5
    assert int(g.loc["view", "max_drawdown"]) == 0
    assert int(g.loc["view", "trough_day"]) == d0
