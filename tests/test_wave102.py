"""Edge-case tests for wave-102 operators: vocabulary growth (a corpus with
all-new tokens per doc grows linearly; a pure-duplicate corpus flattens
after decile 0; boundary semantics are strict-less-than) and decayed
engagement (the weekly right-shift halves exactly; terms past the shift cap
are zero; same-week events do not decay). Ray vs DuckDB equality is
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


def _docs(texts):
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )


def test_vocab_growth_linear_vs_flat(tmp_path):
    # 10 docs, one brand-new token each → curve grows by exactly 1 per decile
    _write(str(tmp_path), "documents", _docs([f"tok{i}" for i in range(10)]))
    g = _compare("docs_vocab_growth", str(tmp_path), ["documents"])
    assert g["vocab_cum"].tolist() == list(range(1, 11))
    # 10 identical docs → all vocabulary first-seen in decile 0, flat after
    _write(str(tmp_path), "documents", _docs(["same words here"] * 10))
    g = _compare("docs_vocab_growth", str(tmp_path), ["documents"])
    assert g["vocab_cum"].tolist() == [3] * 10


def test_decayed_engagement_halving_and_cap(tmp_path):
    anchor = pd.Timestamp("2024-06-30")  # corpus max day
    rows = [
        # user 1: 100.00 today + 100.00 one week ago + 100.00 two weeks ago
        (1, 1, anchor, 100.0),
        (2, 1, anchor - pd.Timedelta(days=7), 100.0),
        (3, 1, anchor - pd.Timedelta(days=14), 100.0),
        # user 2: a same-week (3-day-old) event does not decay at all
        (4, 2, anchor - pd.Timedelta(days=3), 40.0),
        # user 3: far past the 40-shift cap → exact zero contribution
        (5, 3, anchor - pd.Timedelta(days=7 * 60), 99.99),
    ]
    _write(
        str(tmp_path),
        "events",
        pd.DataFrame(
            {
                "event_id": np.array([r[0] for r in rows], np.int64),
                "ts": pd.Series([r[2] for r in rows]).astype("datetime64[us]"),
                "user_id": np.array([r[1] for r in rows], np.int64),
                "event_type": ["click"] * len(rows),
                "value": np.array([r[3] for r in rows], np.float64),
                "props": ["{}"] * len(rows),
            }
        ),
    )
    g = _compare("events_decayed_engagement", str(tmp_path), ["events"]).set_index(
        "user_id"
    )
    assert int(g.loc[1, "score_cents"]) == 10000 + 5000 + 2500
    assert int(g.loc[2, "score_cents"]) == 4000
    assert int(g.loc[3, "score_cents"]) == 0
    assert int(g.loc[3, "n_events"]) == 1
