"""Edge-case tests for wave-39 operators: word dropout where every token of a
doc drops (empty augmented text, zero kept) and where no token drops; latency
quantile monotonicity (p50 ≤ p95 ≤ p99) over the real testdata — the value
contract itself is enforced by the parametrized oracle gate."""

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


def test_word_dropout_all_and_none(tmp_path):
    # doc 3391 drops its single token 'slow' (fnv32('3391:0:D') % 10 == 0 —
    # found by scanning); doc 1 keeps everything (verified below against the
    # oracle, which is authoritative).
    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32

    # find a (doc_id, single-token) pair that drops, deterministically
    drop_id = next(
        i for i in range(1, 100000) if fnv1a32(f"{i}:0:D") % 10 == 0
    )
    keep_id = next(
        i for i in range(1, 100000) if fnv1a32(f"{i}:0:D") % 10 != 0
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.array([drop_id, keep_id], np.int64),
            "text": ["slow", "fast"],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": np.array([4, 4], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs["docs_word_dropout"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.execute(oracles["docs_word_dropout"]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str))
    by_id = {int(r.doc_id): r for r in g.itertuples()}
    assert by_id[drop_id].aug_text == "" and int(by_id[drop_id].n_kept) == 0
    assert by_id[keep_id].aug_text == "fast" and int(by_id[keep_id].n_kept) == 1


def test_latency_quantiles_monotone():
    qs = entrymod.queries()
    g = qs["sg_latency_quantiles"]("/root/testdata/sf0.001")
    for _, grp in g.groupby("tool"):
        v = dict(zip(grp.label, grp.value_micro.astype(int)))
        assert v["p50"] <= v["p95"] <= v["p99"]
        assert v["p99"] <= 15_000_000  # clamped at the largest finite bound
