"""Edge-case tests for wave-123 operators: dimension variance (a constant
coordinate scores exactly zero and ranks last; a two-point coordinate
recovers the closed-form quantized variance and ranks first) and split
leakage (a planted near-dup pair whose ids hash to different splits counts
as crossing; a same-split pair does not). Ray vs DuckDB equality is
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


def test_dim_variance_constant_and_binary(tmp_path):
    n = 10
    vecs = []
    for i in range(n):
        v = np.zeros(64)
        v[0] = 0.5                      # constant → var 0
        v[1] = 1.0 if i % 2 == 0 else -1.0  # ±1 → var 1 (in units²: 1e12)
        vecs.append(v)
    _write(
        str(tmp_path),
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [v.astype(np.float32).tolist() for v in vecs],
                "label": np.zeros(n, np.int32),
            }
        ),
    )
    g = _compare("emb_dim_variance", str(tmp_path), ["embeddings"]).set_index("dim")
    assert int(g.loc[0, "var_pico"]) == 0
    assert int(g.loc[1, "var_pico"]) == 1_000_000_000_000  # (1e6 units)², var 1
    assert int(g.loc[1, "var_rank"]) == 1
    # constant dims tie at zero → ranks fill 2..64 by dim order
    assert int(g.loc[0, "var_rank"]) == 2


def test_split_leakage_planted_pair(tmp_path):
    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32

    # find a (train, val) id pair and a (train, train) pair
    train = [i for i in range(400) if fnv1a32(str(i)) % 100 < 90]
    val = [i for i in range(400) if fnv1a32(str(i)) % 100 >= 90]
    a_cross, b_cross = train[0], val[0]
    a_same, b_same = train[1], train[2]
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    other = "one two three four five six seven eight nine ten " * 8
    docs = {
        a_cross: base, b_cross: base,        # near-dup crossing the split
        a_same: other, b_same: other,        # near-dup inside train
    }
    ids = sorted(docs)
    _write(
        str(tmp_path),
        "documents",
        pd.DataFrame(
            {
                "doc_id": np.array(ids, np.int64),
                "text": [docs[i] for i in ids],
                "lang": ["en"] * len(ids),
                "source": ["s"] * len(ids),
                "n_chars": np.array([len(docs[i]) for i in ids], np.int64),
            }
        ),
    )
    g = _compare("docs_split_leakage", str(tmp_path), ["documents"])
    assert int(g.loc[0, "n_pairs"]) == 2
    assert int(g.loc[0, "n_cross"]) == 1
    assert int(g.loc[0, "cross_bp"]) == 5_000
