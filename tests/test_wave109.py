"""Edge-case tests for wave-109 operators: pruning eval (a time-clustered
hot predicate prunes every day-chunk but the hot one while id-chunks keep
hot rows everywhere — the layout spread is the point) and flap rate (an
alternating series flips at every step, a monotone series never; the first
observation is not a flip). Ray vs DuckDB equality is enforced per-query by
the strict sweep; these pin analytic values."""

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


def test_pruning_eval_layout_spread(tmp_path):
    rows, k = [], 0
    # 4 days × 512 events; all hot (≥450) rows land on day 3, but their
    # event ids are striped across every id-chunk
    for d in range(4):
        for i in range(512):
            hot = (d == 3) and (i % 8 == 0)
            rows.append((k, f"2024-01-0{d + 1} 10:00", "click",
                         500.0 if hot else 10.0))
            k += 1
    # shuffle id→day association so every id-chunk holds some day-3 rows
    ids = np.arange(len(rows))
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(rows))
    rows = [(int(ids[i]), rows[perm[i]][1], rows[perm[i]][2], rows[perm[i]][3])
            for i in range(len(rows))]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_pruning_eval", str(tmp_path), ["events"]).set_index(
        "layout"
    )
    # ts layout: 3 of 4 day-chunks prune
    assert int(g.loc["ts", "n_chunks"]) == 4
    assert int(g.loc["ts", "n_prunable"]) == 3
    # id layout: hot rows striped ⇒ strictly worse pruning than ts layout
    assert int(g.loc["id", "prunable_bp"]) < int(g.loc["ts", "prunable_bp"])


def test_flap_rate_alternating_vs_monotone(tmp_path):
    rows, k = [], 1
    # 'click': alternate 100/300 ten times → 9 flips of 10 observations
    for i in range(10):
        rows.append((k, f"2024-01-01 10:{i:02d}", "click",
                     100.0 if i % 2 == 0 else 300.0)); k += 1
    # 'view': monotone rising but never crossing again after the first
    for i, v in enumerate((100.0, 200.0, 260.0, 280.0)):
        rows.append((k, f"2024-01-01 11:{i:02d}", "view", v)); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_flap_rate", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["click", "n_flaps"]) == 9
    assert int(g.loc["click", "flaps_bp"]) == 9 * 10_000 // 9  # 10000
    assert int(g.loc["view", "n_flaps"]) == 1  # single crossing, no churn
