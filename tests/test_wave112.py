"""Edge-case tests for wave-112 operators: mixup (blending an image with
itself reproduces its own checksums exactly — integer (p+p)//2 = p; a
cross-bucket boundary pair is stitched; id gaps yield no pair) and dedup
funnel (a corpus with one exact duplicate and one near-duplicate yields the
hand-counted retention at each stage). Ray vs DuckDB equality is enforced
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


def _docs(pairs):
    return pd.DataFrame(
        {
            "doc_id": np.array([p[0] for p in pairs], np.int64),
            "text": [p[1] for p in pairs],
            "lang": ["en"] * len(pairs),
            "source": ["s"] * len(pairs),
            "n_chars": np.array([len(p[1]) for p in pairs], np.int64),
        }
    )


def test_mixup_boundary_and_gap(tmp_path):
    # ids 0,1 pair; 63,64 cross the bucket border; 70 has no successor
    _write(str(tmp_path), "documents", _docs(
        [(0, "x"), (1, "x"), (63, "x"), (64, "x"), (70, "x")]
    ))
    g = _compare("image_mixup", str(tmp_path), ["documents"]).set_index("doc_id")
    assert sorted(g.index) == [0, 63]
    assert int(g.loc[63, "next_doc_id"]) == 64


def test_mixup_checksum_matches_direct_blend():
    from sts_opentelemetry_collector_ray.stages.multimodal import (
        IMG_H,
        IMG_W,
        synthesize_image_batch,
    )

    media = synthesize_image_batch(
        pa.table({"doc_id": pa.array([5, 6], pa.int64())})
    )
    imgs = [
        np.frombuffer(p, np.uint8).reshape(IMG_H, IMG_W, 3).astype(np.int64)
        for p in media["payload"].to_pylist()
    ]
    mix = (imgs[0] + imgs[1]) // 2
    expected = mix.sum(axis=(0, 1))
    # pin via the query on a doc table containing ids 5 and 6
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", _docs([(5, "x"), (6, "x")]))
        g = _compare("image_mixup", d, ["documents"])
        assert int(g.loc[0, "sum_r"]) == int(expected[0])
        assert int(g.loc[0, "sum_g"]) == int(expected[1])
        assert int(g.loc[0, "sum_b"]) == int(expected[2])


def test_dedup_funnel_hand_counted(tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    docs = [
        (0, base),
        (1, base),                     # exact duplicate of 0
        (2, base + "iota"),            # near duplicate (tiny suffix change)
        (3, "totally different words entirely " * 8),
    ]
    _write(str(tmp_path), "documents", _docs(docs))
    g = _compare("docs_dedup_funnel", str(tmp_path), ["documents"]).set_index(
        "method"
    )
    assert int(g.loc["corpus", "n_kept"]) == 4
    assert int(g.loc["exact", "n_kept"]) == 3  # 0/1 collapse
    # near-dup keeps at most the exact-survivor count and at least 2
    assert 2 <= int(g.loc["neardup", "n_kept"]) <= 3
    assert int(g.loc["corpus", "kept_bp"]) == 10_000
