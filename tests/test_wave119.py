"""Edge-case tests for wave-119 operators: lifecycle census (a hand-built
population with one user per stage lands each in its stage; 'new' wins over
'active' for young users; zero stages still appear) and IVF balance (a
corpus cloned from one centroid collapses into a single list with imbalance
K·1e6; balance lists sum to the corpus size). Ray vs DuckDB equality is
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


def test_lifecycle_stages(tmp_path):
    mx = pd.Timestamp("2024-06-30")
    rows = [
        # user 1: first event 3 days ago → 'new' (even though also recent)
        (1, mx - pd.Timedelta(days=3), 1),
        # user 2: old first event, last 2 days ago → 'active'
        (2, mx - pd.Timedelta(days=100), 2), (3, mx - pd.Timedelta(days=2), 2),
        # user 3: last event 20 days ago → 'at_risk'
        (4, mx - pd.Timedelta(days=100), 3), (5, mx - pd.Timedelta(days=20), 3),
        # user 4: last event 60 days ago → 'churned'
        (6, mx - pd.Timedelta(days=100), 4), (7, mx - pd.Timedelta(days=60), 4),
        # anchor: make mx the true max day
        (8, mx, 2),
    ]
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": ["click"] * len(rows),
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        },
    ))
    g = _compare("events_lifecycle_census", str(tmp_path), ["events"]).set_index(
        "stage"
    )
    assert int(g.loc["new", "n_users"]) == 1
    assert int(g.loc["active", "n_users"]) == 1
    assert int(g.loc["at_risk", "n_users"]) == 1
    assert int(g.loc["churned", "n_users"]) == 1
    assert len(g) == 4


def test_ivf_balance_single_list(tmp_path):
    from sts_opentelemetry_collector_ray.stages.similarity import seeded_centroids

    cents = seeded_centroids(64, 16, seed=42)
    # 12 near-copies of centroid 5 → every vector lands in list 5
    vecs = [cents[5] * (1.0 + 0.001 * i) for i in range(12)]
    _write(
        str(tmp_path),
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(12, dtype=np.int64),
                "embedding": [v.astype(np.float32).tolist() for v in vecs],
                "label": np.zeros(12, np.int32),
            }
        ),
    )
    g = _compare("emb_ivf_balance", str(tmp_path), ["embeddings"]).set_index("cid")
    assert int(g.loc[5, "list_size"]) == 12
    assert int(g["list_size"].sum()) == 12
    assert int(g.loc[0, "imbalance_micro"]) == 16 * 1_000_000  # fully skewed
