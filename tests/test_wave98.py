"""Edge-case tests for wave-98 operators: image edge density (closed-form
expectation — the background x-gradient never crosses the threshold, so
edge_px counts exactly the inverted rectangle's vertical borders clipped by
the image edge) and DP counts (the seeded Laplace draw is reproducible and
hand-replayable; the release differs from the exact count by the predicted
noise). Ray vs DuckDB equality is enforced per-query by the strict sweep;
these pin analytic values."""

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


def _docs(ids):
    n = len(ids)
    return pd.DataFrame(
        {
            "doc_id": np.array(ids, np.int64),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.ones(n, np.int64),
        }
    )


def test_image_edges_rectangle_borders(tmp_path):
    # Background: r = (x*255)//63 — consecutive diffs are 4 or 5, never ≥ 32.
    # The inverted 16×12 rectangle creates vertical borders at x0 and x0+16
    # with |jump| = |255 − 2·(x·255)//63| ≥ 32 on 12 rows each; a border at
    # x0 = 0 has no left neighbor and contributes nothing.
    _write(str(tmp_path), "documents", _docs([0, 1, 10]))
    g = _compare("image_edges", str(tmp_path), ["documents"]).set_index("media_id")
    # doc 0: rectangle at x0=0 → only the RIGHT border (x=16) counts: 12 px
    assert int(g.loc[0, "edge_px"]) == 12
    # doc 1 (x0=1) and doc 10 (x0=10): both borders visible → 24 px
    assert int(g.loc[1, "edge_px"]) == 24
    assert int(g.loc[10, "edge_px"]) == 24


def test_image_edges_gradient_sum_closed_form():
    # Direct actor check on one bitmap: grad_sum decomposes into the plain
    # background total plus the rectangle's border/interior contribution.
    from sts_opentelemetry_collector_ray.stages.multimodal import (
        ImageEdgeActor,
        synthesize_image_batch,
    )

    tab = synthesize_image_batch(
        pa.table({"doc_id": pa.array([5], pa.int64())})
    )
    out = ImageEdgeActor()(tab)
    # independent numpy replay of the closed-form bitmap
    xx = np.arange(64)
    r = np.tile((xx * 255) // 63, (48, 1))
    x0, y0 = 5 % 48, (5 * 7) % 36
    r[y0 : y0 + 12, x0 : x0 + 16] = 255 - r[y0 : y0 + 12, x0 : x0 + 16]
    gx = np.abs(np.diff(r.astype(np.int64), axis=1))
    assert out["grad_sum"][0].as_py() == int(gx.sum())
    assert out["edge_px"][0].as_py() == int((gx >= 32).sum())


def test_dp_counts_deterministic_noise(tmp_path):
    rows = []
    for i in range(7):
        rows.append((i + 1, "click"))
    for i in range(3):
        rows.append((100 + i, "view"))
    _write(
        str(tmp_path),
        "events",
        pd.DataFrame(
            {
                "event_id": np.array([r[0] for r in rows], np.int64),
                "ts": pd.to_datetime(["2024-01-01"] * len(rows)).astype(
                    "datetime64[us]"
                ),
                "user_id": np.ones(len(rows), np.int64),
                "event_type": [r[1] for r in rows],
                "value": np.ones(len(rows)),
                "props": ["{}"] * len(rows),
            }
        ),
    )
    g = _compare("events_dp_counts", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32

    for ty, n in (("click", 7), ("view", 3)):
        c = fnv1a32(ty) / 4294967296.0 - 0.5
        noisy = n + (-(np.sign(c)) * np.log(1.0 - 2.0 * abs(c))) / 1.0
        assert int(g.loc[ty, "noisy_micro"]) == int(
            np.floor(noisy * 1_000_000.0 + 0.5)
        )
        # the release is perturbed — never the raw count
        assert int(g.loc[ty, "noisy_micro"]) != n * 1_000_000
