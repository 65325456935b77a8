"""Edge-case tests for wave-96 operators: Wilson success rates (hand-checked
closed forms — p=1 gives lb = 1/(1+z²/n), tiny-n humility: 1-of-2 ranks
BELOW 40-of-100 despite the higher point estimate) and autocorrelation pitch
(each synthesized class's detected f0 lands at half the nominal fundamental
— the 2.5·f0 partial makes the true period 2/f0 — within lag-quantization
error; a pure-tone clip recovers its exact period). Ray vs DuckDB equality
is enforced per-query by the strict sweep; these pin analytic values."""

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
    # rows: (event_id, user_id, event_type, value)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime(["2024-01-01 10:00"] * n).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.array([r[3] for r in rows], np.float64),
            "props": ["{}"] * n,
        }
    )


def test_wilson_closed_forms_and_small_n_humility(tmp_path):
    rows, k = [], 1
    # 'click': 1 hit of 2 (p=0.5) — high estimate, tiny sample
    rows.append((k, 1, "click", 60.0)); k += 1
    rows.append((k, 1, "click", 10.0)); k += 1
    # 'view': 40 hits of 100 (p=0.4)
    for i in range(100):
        rows.append((k, 2, "view", 60.0 if i < 40 else 10.0)); k += 1
    # 'signup': all 5 hit (p=1) → lb = 1/(1+z²/n) exactly
    for _ in range(5):
        rows.append((k, 3, "signup", 99.0)); k += 1
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_wilson_rates", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    z = 1.96
    lb1 = 1.0 / (1.0 + (z * z) / 5.0)
    assert abs(float(g.loc["signup", "wilson_lb"]) - lb1) < 2e-6
    assert float(g.loc["signup", "hit_rate"]) == 1.0
    # uncertainty-aware ranking: 1-of-2 click scores BELOW 40-of-100 view
    assert float(g.loc["click", "hit_rate"]) > float(g.loc["view", "hit_rate"])
    assert float(g.loc["click", "wilson_lb"]) < float(g.loc["view", "wilson_lb"])


def test_audio_pitch_class_geometry(tmp_path):
    # doc ids 0..39 cover every synthesis class once
    _write(
        str(tmp_path),
        "documents",
        pd.DataFrame(
            {
                "doc_id": np.arange(40, dtype=np.int64),
                "text": ["x"] * 40,
                "lang": ["en"] * 40,
                "source": ["s"] * 40,
                "n_chars": np.ones(40, np.int64),
            }
        ),
    )
    g = _compare("audio_pitch", str(tmp_path), ["documents"]).set_index("media_id")
    sr = 16_000
    for doc_id in range(40):
        f0 = 100.0 + (doc_id % 40) * 20.0
        lag = int(g.loc[doc_id, "lag"])
        # the 0.6·sin(f0) + 0.3·sin(2.5·f0) mix has true period 2/f0 —
        # the detected lag sits within one sample of an integer MULTIPLE of
        # 2·sr/f0 (when the single period falls between samples the
        # quantization penalty can favor the 2-period peak), except where
        # the 320-sample window cap clips the 100 Hz class
        expect = 2.0 * sr / f0
        if expect <= 320:
            mult = max(round(lag / expect), 1)
            assert abs(lag - mult * expect) <= 1.0, (doc_id, lag, expect)
        # integer round-half-up f0 from the lag
        assert int(g.loc[doc_id, "f0_milli"]) == (2 * sr * 1000 + lag) // (2 * lag)


def test_audio_pitch_pure_tone_exact():
    from sts_opentelemetry_collector_ray.stages.multimodal import AudioPitchActor

    sr = 16_000
    t = np.arange(4000) / sr
    # pure 200 Hz tone → ACF peak at exactly sr/200 = 80 samples
    pcm = (0.5 * np.sin(2 * np.pi * 200.0 * t) * 32767).astype(np.int16)
    tab = pa.table(
        {"media_id": pa.array([1], pa.int64()), "payload": pa.array([pcm.tobytes()])}
    )
    out = AudioPitchActor()(tab)
    assert out["lag"][0].as_py() == 80
    assert out["f0_milli"][0].as_py() == 200_000
