"""Edge-case tests for wave-47 operators: ARI = 1 when labels equal the
assignment exactly (built by relabeling the corpus with the oracled k-means
output) and MASE = 0 on a perfectly weekly-periodic series. Ray vs DuckDB
equality is enforced by the strict sweep; these tests pin the analytic
values."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


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


def test_ari_perfect_agreement(tmp_path):
    # relabel the sf0.001 corpus with its own k-means assignment → ARI = 1
    qs = entrymod.queries()
    assign = qs["emb_kmeans"]("/root/testdata/sf0.001").to_pandas()
    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    amap = dict(zip(assign.vec_id.astype(int), assign.cluster.astype(int)))
    labels = pa.array(
        [amap[int(v)] for v in src["vec_id"].to_pylist()], pa.int32()
    )
    out = src.set_column(src.schema.get_field_index("label"), "label", labels)
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(
        out.replace_schema_metadata(None), f"{tmp_path}/embeddings.parquet"
    )
    g = _compare("emb_cluster_ari", str(tmp_path), ["embeddings"])
    assert int(g.ari_micro.iloc[0]) == 1_000_000


def test_mase_perfect_weekly_series(tmp_path):
    # one event per hour for 3 weeks, value repeating with period 168 →
    # seasonal error 0 → MASE 0 (but naive error > 0)
    H = 3 * 168
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(H), unit="h")
    vals = (10.0 + (np.arange(H) % 168)).astype(float)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, H + 1, dtype=np.int64),
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "user_id": np.ones(H, np.int64),
            "event_type": ["view"] * H,
            "value": vals,
            "props": ["{}"] * H,
        }
    )
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None),
        f"{tmp_path}/events.parquet",
    )
    g = _compare("events_mase_forecast", str(tmp_path), ["events"])
    rec = g.iloc[0]
    assert int(rec.err_seasonal) == 0 and int(rec.mase_micro) == 0
    assert int(rec.err_naive) > 0
