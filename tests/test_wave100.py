"""Edge-case tests for wave-100 operators: Mann–Whitney (hand-computed U on
a planted shift — all-wins gives AUC 1.0, a fully tied pair gives exactly
0.5; u2 keeps ties integer) and luminance histograms (an all-one-bin
constant-luma check via the actor, plus zero-filled bins on the fixture
path). Ray vs DuckDB equality is enforced per-query by the strict sweep;
these pin analytic values."""

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


def _events(vals):
    # vals: (event_type, value)
    n = len(vals)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [v[0] for v in vals],
            "value": np.array([v[1] for v in vals], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_mannwhitney_all_wins_and_ties(tmp_path):
    # clicks all above views → U = n_a·n_b, auc = 1; one tied pair checks u2
    vals = [("click", 10.0), ("click", 11.0), ("view", 1.0), ("view", 2.0)]
    _write(str(tmp_path), "events", _events(vals))
    g = _compare("events_mannwhitney", str(tmp_path), ["events"])
    assert int(g.loc[0, "u2"]) == 2 * 2 * 2  # 2·U, U = 4 wins
    assert int(g.loc[0, "auc_micro"]) == 1_000_000

    vals = [("click", 5.0), ("view", 5.0)]  # single tied pair → U = ½
    _write(str(tmp_path), "events", _events(vals))
    g = _compare("events_mannwhitney", str(tmp_path), ["events"])
    assert int(g.loc[0, "u2"]) == 1
    assert int(g.loc[0, "auc_micro"]) == 500_000


def test_mannwhitney_hand_mixed(tmp_path):
    # A = {1, 3}, B = {2, 3}: wins = (0) + (1) = 1, ties = 1 → u2 = 3
    vals = [("click", 0.01), ("click", 0.03), ("view", 0.02), ("view", 0.03)]
    _write(str(tmp_path), "events", _events(vals))
    g = _compare("events_mannwhitney", str(tmp_path), ["events"])
    assert int(g.loc[0, "u2"]) == 3
    assert int(g.loc[0, "auc_micro"]) == 3 * 1_000_000 // 8


def test_luma_hist_zero_fill_and_totals(tmp_path):
    _write(
        str(tmp_path),
        "documents",
        pd.DataFrame(
            {
                "doc_id": np.array([0, 7], np.int64),
                "text": ["x"] * 2,
                "lang": ["en"] * 2,
                "source": ["s"] * 2,
                "n_chars": np.ones(2, np.int64),
            }
        ),
    )
    g = _compare("image_luma_hist", str(tmp_path), ["documents"])
    # dense long format: every (image, bin) pair present, totals = 64·48 px
    assert len(g) == 2 * 8
    assert g.groupby("media_id")["n_px"].sum().eq(64 * 48).all()
    assert (g["n_px"] >= 0).all()


def test_luma_hist_constant_image_single_bin():
    from sts_opentelemetry_collector_ray.stages.multimodal import ImageLumaHistActor

    img = np.full((4, 4, 3), 100, np.uint8)  # luma 100 → bin 3 (100//32)
    tab = pa.table(
        {
            "media_id": pa.array([9], pa.int64()),
            "payload": pa.array([img.tobytes()]),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([4], pa.int32()),
        }
    )
    out = ImageLumaHistActor()(tab).to_pandas().set_index("bin")
    assert int(out.loc[3, "n_px"]) == 16
    assert int(out["n_px"].sum()) == 16
