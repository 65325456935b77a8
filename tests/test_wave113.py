"""Edge-case tests for wave-113 operators: video flicker (a hand-built
constant-brightness stack has zero flicker; a planted single strobe frame
is counted exactly once up and once down; the synthesized corpus's jumps
match the 29-step sawtooth closed form) and trimmed mean (boundary ties
trim partially; a fat outlier is fully excluded; n<10 trims nothing). Ray
vs DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values."""

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


def test_flicker_actor_constant_and_strobe():
    from sts_opentelemetry_collector_ray.stages.multimodal import VideoFlickerActor

    h, w, f = 4, 4, 6
    const = np.full((f, h, w, 3), 50, np.uint8)
    strobe = const.copy()
    strobe[3] = 255  # one blown frame → jump up then down
    tab = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([const.tobytes(), strobe.tobytes()]),
            "width": pa.array([w, w], pa.int32()),
            "height": pa.array([h, h], pa.int32()),
            "n_frames": pa.array([f, f], pa.int32()),
        }
    )
    out = VideoFlickerActor()(tab).to_pandas().set_index("media_id")
    assert int(out.loc[1, "n_flicker"]) == 0
    assert int(out.loc[1, "max_jump"]) == 0
    assert int(out.loc[2, "n_flicker"]) == 2
    assert int(out.loc[2, "max_jump"]) == (255 - 50) * h * w * 3


def test_flicker_sawtooth_closed_form(tmp_path):
    _write(
        str(tmp_path),
        "documents",
        pd.DataFrame(
            {
                "doc_id": np.arange(12, dtype=np.int64),
                "text": ["x"] * 12,
                "lang": ["en"] * 12,
                "source": ["s"] * 12,
                "n_chars": np.ones(12, np.int64),
            }
        ),
    )
    g = _compare("video_flicker", str(tmp_path), ["documents"]).set_index("media_id")
    px = 24 * 32
    for i in range(12):
        b = [(i * 11 + f * 29) % 256 for f in range(8)]
        jumps = [abs(b[f + 1] - b[f]) * px for f in range(7)]
        assert int(g.loc[i, "n_flicker"]) == sum(1 for j in jumps if j > 100 * px)
        assert int(g.loc[i, "max_jump"]) == max(jumps)


def test_trimmed_mean_outlier_and_small_n(tmp_path):
    rows = []
    # 'click': 18× 1.00 + 1× 0.01 + 1× 1000.00 → n=20, k=2... n//10=2:
    # trims the 0.01, the 1000.00 and one 1.00 from each side → mean 1.00
    vals = [1.0] * 18 + [0.01, 1000.0]
    for i, v in enumerate(vals):
        rows.append((i + 1, "click", v))
    # 'view': n=5 < 10 → nothing trimmed, plain mean
    for i, v in enumerate((1.0, 2.0, 3.0, 4.0, 100.0)):
        rows.append((100 + i, "view", v))
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)).astype(
                "datetime64[us]"
            ),
            "user_id": np.ones(len(rows), np.int64),
            "event_type": [r[1] for r in rows],
            "value": np.array([r[2] for r in rows], np.float64),
            "props": ["{}"] * len(rows),
        },
    ))
    g = _compare("events_trimmed_mean", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["click", "n_trimmed"]) == 4
    assert int(g.loc["click", "trimmed_mean_micro"]) == 100 * 1_000_000
    assert int(g.loc["view", "n_trimmed"]) == 0
    assert int(g.loc["view", "trimmed_mean_micro"]) == (
        (100 + 200 + 300 + 400 + 10000) * 1_000_000 // 5
    )
