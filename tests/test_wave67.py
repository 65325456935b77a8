"""Edge-case tests for wave-67 operators: hubness on a constructed hub (one
vector inside every query's top-k) and interpolation with a hand-computed
midpoint, a round-half-up case, and unfilled leading zeros. Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic
values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, obj):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = (
        pa.Table.from_pandas(obj, preserve_index=False)
        if isinstance(obj, pd.DataFrame)
        else obj
    )
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


def test_hubness_constructed_hub(tmp_path):
    # 3 query vectors (ids 1-3) along distinct axes; a hub (id 4) close to
    # ALL of them (equal mix); fillers (5-10) near only their own axis.
    dim = 64
    vecs = []
    for i in range(3):
        v = np.zeros(dim)
        v[i] = 1.0
        vecs.append(v)
    hub = np.zeros(dim)
    hub[0] = hub[1] = hub[2] = 1.0
    vecs.append(hub)
    for i in range(6):
        v = np.zeros(dim)
        v[10 + i] = 1.0
        vecs.append(v)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(1, len(vecs) + 1, dtype=np.int64)),
            "embedding": pa.array(
                [np.asarray(v, np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(len(vecs), np.int32)),
        }
    )
    _write(str(tmp_path), "embeddings", t)
    g = _compare("emb_knn_hubness", str(tmp_path), ["embeddings"]).set_index(
        "in_degree"
    )
    # corpus (10) < NQ (50) -> ALL vectors are queries; hand-trace of the
    # cosine + id-tiebreak ranking gives degrees {1..5: 9 each, 6: 5}
    assert (g["n_vectors"] * g.index).sum() == 10 * 5  # every slot accounted
    assert int(g.loc[9, "n_vectors"]) == 5
    assert int(g.loc[5, "n_vectors"]) == 1


def _events_hours(counts):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append(base + pd.Timedelta(hours=h, minutes=i % 50))
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(rows).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": ["a"] * n,
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_interpolation_midpoint_and_rounding(tmp_path):
    # two types share the global grid; type 'a' counts per hour:
    # [2, 0, 4, 0, 0, 3]: hour 1 -> (2+4)/2 = 3.0; hours 3,4 between 4 and 3:
    # h3 = 4 + (3-4)/3 = 3.666..., round-half-up micro = 3666667
    # h4 = 4 + 2*(3-4)/3 = 3.333... -> 3333333
    _write(str(tmp_path), "events", _events_hours([2, 0, 4, 0, 0, 3]))
    g = _compare("events_interpolate_gaps", str(tmp_path), ["events"])
    base_hr = int(pd.Timestamp("2024-01-01").value // 10**9 // 3600)
    got = {int(r.hr) - base_hr: int(r.filled_micro) for r in g.itertuples()}
    assert got == {1: 3_000_000, 3: 3_666_667, 4: 3_333_333}


def test_interpolation_skips_leading_zero(tmp_path):
    # counts [0, 5, 0, 5]: hour 0 has no LEFT bracket -> only hour 2 fills
    # build by shifting: first event at hour 1
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for h, c in ((1, 5), (3, 5)):
        for i in range(c):
            rows.append(base + pd.Timedelta(hours=h, minutes=i))
    # an hour-0 marker from ANOTHER type widens the global grid to hour 0
    rows_b = [base]
    n = len(rows) + 1
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(rows + rows_b).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": ["a"] * len(rows) + ["b"],
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_interpolate_gaps", str(tmp_path), ["events"])
    a = g[g.event_type == "a"]
    base_hr = int(base.value // 10**9 // 3600)
    assert list(a.hr - base_hr) == [2]
    assert int(a.filled_micro.iloc[0]) == 5_000_000
