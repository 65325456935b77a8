"""Edge-case tests for wave-32 operators: int8 quantization with an all-zero
dimension (scale=0 guard), exact-half rounding points and negatives; blocklist
filtering where the blocked word appears only as a substring (word-boundary
contract). Tiny adversarial tables run through BOTH the Ray query and its
DuckDB oracle (both oracles are sf-independent)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod


def _write(dirpath, name, tbl: pa.Table):
    import os

    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(tbl.replace_schema_metadata(None), f"{dirpath}/{name}.parquet")


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
    assert len(g) == len(e), f"{name}: rows {len(g)} != {len(e)}"
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def test_quantize_zero_dim_and_half_rounding(tmp_path):
    # dim 0: all zeros (scale=0 -> q=0, no NaN); dim 1: max|x|=1.27 so
    # scale=0.01 and x=0.005 sits exactly on a representable half point only
    # after division — exercises the shared floor(x+0.5) rule; dim 2 negative
    # heavy so the half-away branch runs on both signs.
    vecs = [
        [0.0, 1.27, -2.0],
        [0.0, -1.27, 2.0],
        [0.0, 0.635, -0.5],
        [0.0, 0.0, 0.25],
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0, 0], pa.int32()),
        }
    )
    _write(str(tmp_path), "embeddings", tbl)
    g = _compare("emb_quantize_int8", str(tmp_path), ["embeddings"])
    by_id = {int(r.vec_id): r.q_csv for r in g.itertuples()}
    # zero dim stays 0 everywhere; extremes hit exactly ±127
    assert all(q.split(",")[0] == "0" for q in by_id.values())
    assert by_id[1].split(",")[1] == "127" and by_id[2].split(",")[1] == "-127"


def test_blocklist_word_boundaries(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "text": [
                "slowly is not slow blocked",  # substring 'slowly' must NOT hit
                "dup dup lag",  # three hits
                "clean text only",
                "backlog has no lag word? lag.",  # 'backlog' no, trailing 'lag.' yes
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": np.array([10, 10, 10, 10], dtype=np.int64),
        }
    )
    tbl = pa.Table.from_pandas(docs, preserve_index=False)
    _write(str(tmp_path), "documents", tbl)
    g = _compare("docs_blocklist_filter", str(tmp_path), ["documents"])
    hits = dict(zip(g.doc_id.astype(int), g.bad_hits.astype(int)))
    assert hits == {1: 1, 2: 3, 3: 0, 4: 2}
