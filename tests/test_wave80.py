"""Edge-case tests for wave-80 operators: embedding OOD (a planted far
outlier ranks first; its nearest label can differ from its own; nearest-label
ties break low) and seasonal anomaly (a planted burst hour dominates; dense
zero-count hours pull the seasonal mean down; deterministic tie-break). Ray
vs DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_table(dirpath, name, t: pa.Table):
    import os

    os.makedirs(dirpath, exist_ok=True)
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


def test_emb_ood_planted_outlier(tmp_path):
    def v(x, d=0):
        vec = [0.0] * 64
        vec[d] = x
        return vec

    rows = [
        # label 0 cluster near origin
        (1, 0, v(0.00)),
        (2, 0, v(0.02)),
        # label 1 cluster near 0.3 on dim 1
        (3, 1, v(0.30, 1)),
        (4, 1, v(0.32, 1)),
        # planted outlier labeled 0 but sitting far away on dim 2:
        # nearest centroid is still one of the two, distance dominates all
        (5, 0, v(0.45, 2)),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [list(map(float, r[2])) for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    _write_table(str(tmp_path), "embeddings", t)
    g = _compare("emb_ood", str(tmp_path), ["embeddings"])
    # _compare re-sorts by column order; rank by value instead
    top = g.sort_values("nearest_d2", ascending=False).iloc[0]
    assert int(top["vec_id"]) == 5
    assert int(top["label"]) == 0


def test_seasonal_anomaly_burst_and_dense_zeros(tmp_path):
    # grid: 48 hours (2 days), one type. hour-of-day 5 has a 50-event burst
    # on day 1 and zero on day 2 -> big deviation both days (the burst hour
    # above its mean, the quiet day-2 hour below it).
    ts, eid = [], []
    k = 0
    base = pd.Timestamp("2024-01-01")
    for d in (0, 1):
        for h in range(24):
            n = 50 if (d == 0 and h == 5) else 1
            for _ in range(n):
                ts.append(base + pd.Timedelta(days=d, hours=h, minutes=1))
                eid.append(k)
                k += 1
    ev = pd.DataFrame(
        {
            "event_id": np.array(eid, np.int64),
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "user_id": np.ones(len(ts), np.int64),
            "event_type": ["click"] * len(ts),
            "value": np.ones(len(ts), np.float64),
            "props": ["{}"] * len(ts),
        }
    )
    _write_table(
        str(tmp_path), "events",
        pa.Table.from_pandas(ev, preserve_index=False),
    )
    g = _compare("events_seasonal_anomaly", str(tmp_path), ["events"])
    # hod 5 mean = (50+1)/2 = 25.5 -> burst hour dev = |50 - 25.5| = 24.5;
    # the quiet day-2 hod-5 hour ties at the same magnitude from below
    top2 = g.sort_values(
        ["dev_micro", "hour"], ascending=[False, True], kind="mergesort"
    ).head(2)
    assert set(top2["dev_micro"]) == {24_500_000}
    assert set(top2["seasonal_mean_micro"]) == {25_500_000}
    assert sorted(top2["cnt"]) == [1, 50]
    # every other hour deviates by exactly its hod's 0-vs-mean baseline (0)
    rest = g.sort_values("dev_micro", ascending=False).iloc[2:]
    assert (rest["dev_micro"] == 0).all()
