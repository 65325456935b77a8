"""Edge-case tests for wave-76 operators: simplified silhouette (perfectly
separated clusters → score ≈ +1; a point midway between centroids → 0;
tight-vs-far geometry hand-checked) and the windowed band join (strict lower
bound, inclusive upper bound, cross-user isolation). Ray vs DuckDB equality
is enforced per-query by the strict sweep; these pin analytic values on tiny
adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, df: pd.DataFrame, schema: pa.Schema | None = None):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
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


def _embeddings(rows):
    # rows: (vec_id, label, vec64)
    return pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [list(map(float, r[2])) for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[1] for r in rows], pa.int32()),
        }
    )


def _events(rows):
    # rows: (event_id, ts, user_id, event_type)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows], format="mixed").astype(
                "datetime64[us]"
            ),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_silhouette_separated_clusters(tmp_path):
    import os

    # two tight, well-separated clusters on dim 0: label 0 at ~0.0,
    # label 1 at ~0.4 (embedding range matches testdata's ±0.5 scale).
    def v(x):
        vec = [0.0] * 64
        vec[0] = x
        return vec

    rows = [
        (1, 0, v(0.00)),
        (2, 0, v(0.01)),
        (3, 1, v(0.40)),
        (4, 1, v(0.41)),
        # point exactly midway between the two centroids -> s == 0
        (5, 0, v(0.2050048828125)),  # (c0 + c1)/2 in fixed point
    ]
    t = _embeddings(rows)
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t.replace_schema_metadata(None), f"{tmp_path}/embeddings.parquet")
    g = _compare("emb_silhouette", str(tmp_path), ["embeddings"]).set_index("label")
    assert int(g.loc[1, "n_vec"]) == 2
    # tight far clusters: label-1 mean silhouette close to 1
    assert int(g.loc[1, "mean_sil_micro"]) > 900_000
    # label 0 holds the midway point (s≈0) and two tight points -> mean well
    # below label 1's but positive
    assert 0 < int(g.loc[0, "mean_sil_micro"]) < int(g.loc[1, "mean_sil_micro"])


def test_band_join_bounds_and_user_isolation(tmp_path):
    ev = _events(
        [
            (1, "2024-01-01 10:00:00", 1, "click"),
            (2, "2024-01-01 10:00:00", 1, "purchase"),  # same ts -> strict, no
            (3, "2024-01-01 10:30:00", 1, "purchase"),  # exactly +30min -> yes
            (4, "2024-01-01 10:30:00.000001", 1, "purchase"),  # +30min+1us -> no
            (5, "2024-01-01 10:05:00", 2, "purchase"),  # other user -> no
            (6, "2024-01-01 11:00:00", 2, "click"),  # user 2: no purchases after
            (7, "2024-01-01 09:00:00", 3, "purchase"),  # user 3 has no clicks
        ]
    )
    _write(str(tmp_path), "events", ev)
    g = _compare("events_band_join", str(tmp_path), ["events"]).set_index("user_id")
    assert set(g.index) == {1, 2}  # user 3 has no clicks -> absent
    assert int(g.loc[1, "n_a"]) == 1 and int(g.loc[1, "n_pairs"]) == 1
    assert int(g.loc[2, "n_a"]) == 1 and int(g.loc[2, "n_pairs"]) == 0
