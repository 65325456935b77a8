"""Edge-case tests for wave-118 operators: seasonality strength (values
fully determined by the hour score eta² ≈ 1; hour-independent constant
values score 0) and intrinsic dimension (probes on a 2-D circle embedded in
64-D recover d̂ ≈ 2 within estimator noise; the estimator is
scale-invariant by construction). Ray vs DuckDB equality is enforced
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


def test_seasonality_strength_extremes(tmp_path):
    rows, k = [], 1
    # 'click': value == hour number → hour explains everything (eta² = 1)
    for h in range(6):
        for _ in range(3):
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                         1, "click", float(10 + h))); k += 1
    # 'view': constant value → SST = 0 → eta² defined as 0
    for h in range(6):
        rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                     1, "view", 7.0)); k += 1
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.array([r[4] for r in rows], np.float64),
            "props": ["{}"] * len(rows),
        },
    ))
    g = _compare("events_seasonality_strength", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["click", "eta2_micro"]) == 1_000_000
    assert int(g.loc["view", "eta2_micro"]) == 0


def test_intrinsic_dim_circle(tmp_path):
    # 120 points at RANDOM angles on a unit circle spanned by two fixed
    # axes in 64-D → a 1-D Poisson manifold, TwoNN ≈ 1. (A regular grid
    # would send d₂/d₁ → 1 and blow the estimator up — the documented
    # failure mode, not a bug.)
    n, d = 120, 64
    rng = np.random.default_rng(3)
    e1 = np.zeros(d); e1[0] = 1.0
    e2 = np.zeros(d); e2[1] = 1.0
    vecs = []
    for theta in 2 * np.pi * rng.random(n):
        vecs.append(np.cos(theta) * e1 + np.sin(theta) * e2)
    _write(
        str(tmp_path),
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [v.astype(np.float32).tolist() for v in vecs],
                "label": np.zeros(n, np.int32),
            }
        ),
    )
    g = _compare("emb_intrinsic_dim", str(tmp_path), ["embeddings"])
    d_hat = int(g.loc[0, "id_micro"]) / 1e6
    assert 0.5 < d_hat < 2.0  # 1-D manifold, estimator noise allowed
    assert int(g.loc[0, "n_probes"]) == 50
