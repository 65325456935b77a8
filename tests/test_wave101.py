"""Edge-case tests for wave-101 operators: per-source KL (a source matching
the corpus mix scores ~0; a source concentrated on one token scores the
hand-computed divergence; rare tokens fold into OTHER) and burstiness (a
token spread one-per-doc is sub-Poisson, VMR = 1 − S/N; a token packed into
a single doc scores (N−1)·S/N). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values."""

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


def _docs(texts, sources):
    n = len(texts)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )


def test_source_kl_identical_and_skewed(tmp_path):
    # source 'm' mirrors the corpus shape exactly over a 2-token vocabulary
    # split evenly across sources → its own mix equals the global mix → KL 0
    texts = ["aa bb", "aa bb", "aa aa bb bb"]
    sources = ["m", "m", "m"]
    # source 's' is all-aa → hand-computable divergence from the pooled mix
    texts += ["aa aa aa aa"]
    sources += ["s"]
    _write(str(tmp_path), "documents", _docs(texts, sources))
    g = _compare("docs_source_kl", str(tmp_path), ["documents"]).set_index("source")
    # corpus: aa=8, bb=4 (N=12). m: aa=4 bb=4 (n=8); s: aa=4 (n=4)
    pm_aa, pm_bb, q_aa, q_bb = 4 / 8, 4 / 8, 8 / 12, 4 / 12
    exp_m = pm_aa * np.log(pm_aa / q_aa) + pm_bb * np.log(pm_bb / q_bb)
    assert abs(float(g.loc["m", "kl"]) - exp_m) < 2e-6
    exp_s = 1.0 * np.log(1.0 / q_aa)
    assert abs(float(g.loc["s", "kl"]) - exp_s) < 2e-6
    assert int(g.loc["m", "n_tokens"]) == 8
    assert float(g.loc["s", "kl"]) > float(g.loc["m", "kl"])


def test_burstiness_uniform_vs_packed(tmp_path):
    # 'ww' once per doc across 4 docs → VMR = 1 − S/N = 0 (S=N=4)
    # 'zz' 4 times in one doc of 4 → VMR = (N·S2 − S²)/(N·S) = (64−16)/16 = 3
    texts = ["ww zz zz zz zz", "ww", "ww", "ww"]
    _write(str(tmp_path), "documents", _docs(texts, ["s"] * 4))
    g = _compare("docs_token_burstiness", str(tmp_path), ["documents"]).set_index(
        "token"
    )
    assert int(g.loc["ww", "vmr_micro"]) == 0
    assert int(g.loc["ww", "n_occurrences"]) == 4
    assert int(g.loc["zz", "vmr_micro"]) == 3_000_000
    assert int(g.loc["zz", "n_occurrences"]) == 4
