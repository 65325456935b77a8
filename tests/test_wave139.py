"""Edge-case tests for wave-139 operators: length-bias Pearson on hand-built
embeddings whose energy is exactly linear / anti-linear in n_chars, and load
factor on hand-built daily schedules (uniform -> 1.0, bursty spike). The
value contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_docs_embs(tmp_path, n_chars, energies, langs=None):
    n = len(n_chars)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x" * c for c in n_chars],
            "lang": langs if langs is not None else ["en"] * n,
            "source": ["web"] * n,
            "n_chars": np.asarray(n_chars, dtype=np.int64),
        }
    )
    # embedding = [sqrt(e), 0, 0, ...]: quantized energy ≈ e in micro² units.
    # Use exactly representable values: e is a perfect square of k/1e6.
    vecs = [
        np.r_[np.float32(k), np.zeros(63, dtype=np.float32)] for k in energies
    ]
    embs = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": vecs,
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    for name, df in (("documents", docs), ("embeddings", embs)):
        t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )
        pq.write_table(t, f"{tmp_path}/{name}.parquet")


def _write_events(tmp_path, days, types):
    n = len(days)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(days).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": types,
            "value": np.ones(n),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_length_bias_perfect_correlation(tmp_path):
    # single nonzero element k -> energy = (k·1e6)² exactly; en picks
    # n_chars = k² (energy perfectly linear in n_chars, r = +1), fr picks
    # n_chars = 10 − k² (exactly anti-linear, r = −1).
    _write_docs_embs(
        tmp_path,
        n_chars=[1, 4, 9, 9, 6, 1],
        energies=[1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
        langs=["en", "en", "en", "fr", "fr", "fr"],
    )
    got = _run("emb_length_bias", tmp_path).set_index("lang")
    assert int(got.loc["en", "pearson_micro"]) == 1_000_000
    assert int(got.loc["fr", "pearson_micro"]) == -1_000_000
    assert int(got.loc["en", "n_docs"]) == 3


def test_length_bias_constant_energy_excluded(tmp_path):
    _write_docs_embs(tmp_path, n_chars=[10, 20, 30], energies=[2.0, 2.0, 2.0])
    got = _run("emb_length_bias", tmp_path)
    assert len(got) == 0  # zero energy variance -> absent


def test_load_factor_uniform_and_spike(tmp_path):
    # type u: 2/day over 3 days -> load = 1.0
    # type s: days [1,1,1,4] -> n=7, days=2... build explicitly:
    days = (
        ["2024-01-01"] * 2 + ["2024-01-02"] * 2 + ["2024-01-03"] * 2
        + ["2024-02-01"] * 1 + ["2024-02-02"] * 3
    )
    types = ["u"] * 6 + ["s"] * 4
    _write_events(tmp_path, days, types)
    got = _run("events_load_factor", tmp_path).set_index("event_type")
    assert int(got.loc["u", "load_micro"]) == 1_000_000
    assert int(got.loc["u", "peak_daily"]) == 2
    # s: peak 3, days 2, n 4 -> 3*2/4 = 1.5
    assert int(got.loc["s", "load_micro"]) == 1_500_000
    assert int(got.loc["s", "n_days"]) == 2
