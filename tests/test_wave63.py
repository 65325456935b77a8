"""Edge-case tests for wave-63 operators: fixed-point centroids on
hand-built vectors (exact mean, including a negative-sum floor-division
case — the DuckDB truncation-vs-floor trap) and character entropy on
uniform/single-char corpora (ln 4 and 0 closed forms). Ray vs DuckDB
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


def test_centroids_exact_including_negative_floor(tmp_path):
    dim = 64
    # label 0: vectors [1, ...] and [2, ...] on dim 0 -> mean 1.5 exactly
    # label 1: single vector with NEGATIVE odd quantized dim-0 value:
    #   x = -3/2^20 quantizes to -3; mean over 2 vectors with q=-3 and q=0
    #   -> floor(-3/2) = -2 (floor), NOT -1 (truncation) — the trap case
    v0a = np.zeros(dim, np.float32); v0a[0] = 1.0
    v0b = np.zeros(dim, np.float32); v0b[0] = 2.0
    v1a = np.zeros(dim, np.float32); v1a[0] = np.float32(-3.0 / (1 << 20))
    v1b = np.zeros(dim, np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(1, 5, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in (v0a, v0b, v1a, v1b)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.array([0, 0, 1, 1], np.int32)),
        }
    )
    _write(str(tmp_path), "embeddings", t)
    g = _compare("emb_label_centroids", str(tmp_path), ["embeddings"]).set_index(
        ["label", "dim"]
    )
    scale = 1 << 20
    assert int(g.loc[(0, 0), "centroid_fp"]) == (3 * scale) // 2  # 1.5 exact
    assert int(g.loc[(0, 1), "centroid_fp"]) == 0
    assert int(g.loc[(1, 0), "centroid_fp"]) == -2  # floor(-3/2)
    assert int(g.loc[(0, 0), "n"]) == 2


def test_char_entropy_closed_forms(tmp_path):
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], np.int64),
            # 'en': 4 equally frequent chars -> H = ln 4
            # 'xx': single repeated char -> H = 0
            "text": ["abcd" * 5, "zzzzz"],
            "lang": ["en", "xx"],
            "source": ["t", "t"],
            "n_chars": np.array([20, 5], np.int64),
        }
    )
    _write(str(tmp_path), "documents", df)
    g = _compare(
        "docs_char_entropy_by_lang", str(tmp_path), ["documents"]
    ).set_index("lang")
    assert int(g.loc["en", "n_chars"]) == 20
    assert int(g.loc["en", "n_distinct"]) == 4
    assert int(g.loc["en", "entropy_micro"]) == int(
        np.floor(np.log(4.0) * 1e6 + 0.5)
    )
    assert int(g.loc["xx", "entropy_micro"]) == 0
