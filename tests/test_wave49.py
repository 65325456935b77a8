"""Edge-case tests for wave-49 operators: z-test with equal conversion rates
(z = 0) and an all-converted arm; LIX with real sentence punctuation and a
long-word-free doc. Ray vs DuckDB equality is enforced per-query; these pin
analytic values on tiny adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod
from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32


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


def test_ab_ztest_equal_rates(tmp_path):
    # pick 2 users per arm by scanning the hash; give each arm 1 converter →
    # identical rates → z exactly 0
    arm0 = [u for u in range(1, 200) if fnv1a32(str(u)) % 2 == 0][:2]
    arm1 = [u for u in range(1, 200) if fnv1a32(str(u)) % 2 == 1][:2]
    rows = []
    eid = 1
    for users in (arm0, arm1):
        for i, u in enumerate(users):
            rows.append((eid, u, "purchase" if i == 0 else "view"))
            eid += 1
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_ab_ztest", str(tmp_path), ["events"])
    rec = g.iloc[0]
    assert int(rec.n_a) == 2 and int(rec.n_b) == 2
    assert int(rec.conv_a) == 1 and int(rec.conv_b) == 1
    assert rec.z_micro == 0.0


def test_readability_sentences_and_long_words(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], np.int64),
            "text": [
                # 6 words, 2 sentences, 2 long (>6 chars): LIX = 3 + 100·2/6
                "alpha considerable cat. wonderful dog bird?",
                "a b c",  # no long words, no punctuation → LIX = 3 + 0
            ],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": np.array([10, 5], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_readability", str(tmp_path), ["documents"])
    m = {int(r.doc_id): r for r in g.itertuples()}
    assert int(m[1].n_sentences) == 2 and int(m[1].n_long) == 2
    assert int(m[1].lix_micro) == int(np.floor((6 / 2 + 100 * 2 / 6) * 1e6 + 0.5))
    assert int(m[2].lix_micro) == 3_000_000
