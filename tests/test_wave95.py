"""Edge-case tests for wave-95 operators: exact heavy users (the strict
1/K threshold — a user exactly AT total/K is excluded; floor-division micro
share) and Markov conditional entropy (a deterministic cycle gives zero
entropy, a uniform 2-way branch gives ln 2; transitions never cross user
boundaries). Ray vs DuckDB equality is enforced per-query by the strict
sweep; these pin analytic values on tiny adversarial tables."""

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
    # rows: (event_id, ts, user_id, event_type)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_heavy_users_strict_threshold(tmp_path):
    # 280 events total; K=140 → heavy iff cnt > 2. user 1: 3 events (heavy),
    # user 2: exactly 2 (AT the threshold — excluded), rest spread 1 each.
    rows, k = [], 1
    for _ in range(3):
        rows.append((k, "2024-01-01 10:00", 1, "click")); k += 1
    for _ in range(2):
        rows.append((k, "2024-01-01 10:00", 2, "click")); k += 1
    for u in range(3, 278):
        rows.append((k, "2024-01-01 10:00", u, "view")); k += 1
    assert len(rows) == 280
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_heavy_users", str(tmp_path), ["events"])
    assert g["user_id"].tolist() == [1]
    assert int(g.loc[0, "cnt"]) == 3
    assert int(g.loc[0, "share_micro"]) == 3 * 1_000_000 // 280


def test_markov_entropy_cycle_and_branch(tmp_path):
    rows, k = [], 1
    # user 1: strict cycle click→view→click→view... ⇒ H(next|click)=0
    seq = ["click", "view"] * 6
    for i, ty in enumerate(seq):
        rows.append((k, f"2024-01-01 10:{i:02d}", 1, ty)); k += 1
    # user 2: from 'signup', next is purchase/error alternating evenly ⇒ ln 2
    for i in range(8):
        rows.append((k, f"2024-01-02 10:{2 * i:02d}", 2, "signup")); k += 1
        nxt = "purchase" if i % 2 == 0 else "error"
        rows.append((k, f"2024-01-02 10:{2 * i + 1:02d}", 2, nxt)); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_markov_entropy", str(tmp_path), ["events"]).set_index(
        "prev_type"
    )
    assert float(g.loc["click", "entropy"]) == 0.0
    assert int(g.loc["click", "n_transitions"]) == 6
    assert abs(float(g.loc["signup", "entropy"]) - np.log(2.0)) < 1e-6
    # last event of user 1 is 'view' (no next); user boundary adds no pair:
    # view→(user2's first signup) must NOT be counted
    assert int(g.loc["view", "n_transitions"]) == 5


def test_markov_entropy_user_boundary_isolated(tmp_path):
    # two single-event users → no transitions at all → empty result
    rows = [(1, "2024-01-01", 1, "click"), (2, "2024-01-01", 2, "view")]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_markov_entropy", str(tmp_path), ["events"])
    assert len(g) == 0
