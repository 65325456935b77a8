"""Edge-case tests for wave-54 operators: PQ codes on vectors built from the
codebooks themselves (known code per subspace, packed arithmetic) and
last-touch attribution on hand-built journeys (latest touch wins, 7-day
lookback expiry, direct when untouched, same-timestamp tiebreak). Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin analytic
values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, df_or_table):
    import os

    os.makedirs(dirpath, exist_ok=True)
    if isinstance(df_or_table, pd.DataFrame):
        t = pa.Table.from_pandas(df_or_table, preserve_index=False)
    else:
        t = df_or_table
    pq.write_table(t.replace_schema_metadata(None), f"{dirpath}/{name}.parquet")


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


def test_pq_codes_hit_their_codebook_entries(tmp_path):
    from sts_opentelemetry_collector_ray.pipelines.queries54 import _pq_codebooks

    books = _pq_codebooks()
    want = [3, 7, 0, 15]
    vec = np.concatenate([books[m][c] for m, c in enumerate(want)]).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([vec.tolist()], pa.list_(pa.float32())),
            "label": pa.array([0], pa.int32()),
        }
    )
    _write(str(tmp_path), "embeddings", t)
    g = _compare("emb_pq", str(tmp_path), ["embeddings"]).iloc[0]
    assert [int(g.code_0), int(g.code_1), int(g.code_2), int(g.code_3)] == want
    assert int(g.packed) == ((3 * 16 + 7) * 16 + 0) * 16 + 15


def _events(rows):
    # rows: (event_id, ts_iso, user_id, event_type, value)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.array([r[4] for r in rows], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_attribution_journeys(tmp_path):
    rows = [
        # user 1: click then view then purchase -> 'view' (latest touch wins)
        (1, "2024-01-01 10:00:00", 1, "click", 0.0),
        (2, "2024-01-01 11:00:00", 1, "view", 0.0),
        (3, "2024-01-01 12:00:00", 1, "purchase", 10.0),
        # user 2: no touches -> 'direct'
        (4, "2024-01-02 09:00:00", 2, "purchase", 5.0),
        # user 3: click 8 days before purchase -> lookback expired -> 'direct'
        (5, "2024-01-01 00:00:00", 3, "click", 0.0),
        (6, "2024-01-09 00:00:01", 3, "purchase", 7.0),
        # user 4: touch at the SAME ts, lower event_id -> credited
        (7, "2024-01-03 08:00:00", 4, "click", 0.0),
        (8, "2024-01-03 08:00:00", 4, "purchase", 2.0),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_attribution", str(tmp_path), ["events"]).set_index(
        "channel"
    )
    assert int(g.loc["view", "n_conversions"]) == 1
    assert int(g.loc["view", "value_cents"]) == 1000
    assert int(g.loc["click", "n_conversions"]) == 1
    assert int(g.loc["click", "value_cents"]) == 200
    assert int(g.loc["direct", "n_conversions"]) == 2
    assert int(g.loc["direct", "value_cents"]) == 1200
