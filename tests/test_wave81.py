"""Edge-case tests for wave-81 operators: image phash (identical class keys
hash identically; the bit-63 cell wraps through two's complement without
drift; n_bits equals the popcount) and OOV rate (a held-out-only token is
OOV, vocabulary ties break lexicographically, even docs never score). Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

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


def _docs(rows):
    # rows: (doc_id, text, source)
    n = len(rows)
    return pd.DataFrame(
        {
            "doc_id": np.array([r[0] for r in rows], np.int64),
            "text": [r[1] for r in rows],
            "lang": ["en"] * n,
            "source": [r[2] for r in rows],
            "n_chars": np.array([len(r[1]) for r in rows], np.int64),
        }
    )


def test_phash_class_consistency_and_popcount(tmp_path):
    # doc_ids 1 and 1+144 share the synth class (x0 period 48, y0 period 36,
    # lcm(48,36)=144 for the red channel) -> identical phash
    docs = _docs([(1, "a", "s"), (145, "b", "s"), (7, "c", "s")])
    _write(str(tmp_path), "documents", docs)
    g = _compare("image_phash", str(tmp_path), ["documents"]).set_index("media_id")
    assert int(g.loc[1, "phash"]) == int(g.loc[145, "phash"])
    for mid in (1, 145, 7):
        h = np.uint64(np.int64(g.loc[mid, "phash"]))
        pop = bin(int(h)).count("1")
        assert pop == int(g.loc[mid, "n_bits"])
    # phash actually discriminates across classes
    assert int(g.loc[1, "phash"]) != int(g.loc[7, "phash"])


def test_oov_holdout_and_ties(tmp_path):
    # even docs (vocab corpus): tokens {alpha(2x), beta}. K=500 keeps all.
    # odd docs (eval): 'alpha beta gamma' -> gamma is OOV (1/3);
    # source B: 'gamma gamma' -> 2/2 OOV.
    docs = _docs(
        [
            (0, "alpha alpha beta", "A"),
            (2, "beta alpha", "A"),
            (1, "alpha beta gamma", "A"),
            (3, "gamma gamma", "B"),
        ]
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_oov_rate", str(tmp_path), ["documents"]).set_index("source")
    assert int(g.loc["A", "n_tokens"]) == 3
    assert int(g.loc["A", "n_oov"]) == 1
    assert int(g.loc["A", "oov_rate_micro"]) == 333_333
    assert int(g.loc["B", "n_tokens"]) == 2
    assert int(g.loc["B", "oov_rate_micro"]) == 1_000_000
