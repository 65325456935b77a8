"""Edge-case tests for wave-117 operators: Page–Hinkley (a planted level
shift detects on the hand-computed first-crossing day; a flat series never
detects and its max deviation is ~0) and PQ distortion (a corpus built
FROM the codewords has zero distortion; distortion is strictly positive on
generic vectors). Ray vs DuckDB equality is enforced per-query by the
strict sweep; these pin analytic values."""

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


def test_page_hinkley_shift_and_flat(tmp_path):
    rows, k = [], 1
    # 'click': 20 days at 2/day then 20 days at 12/day — a strong upshift.
    # D=40, S=280: per-day term 10·40·x − 11·280 = 400x − 3080
    #  pre: −2280/day; post: +1720/day. Running-min bottoms at day 19;
    #  dev then climbs 1720/day; Λ = 20·280 = 5600 → crossing on the 4th
    #  post-shift day (3·1720=5160 < 5600 ≤ 4·1720).
    for d in range(20):
        for _ in range(2):
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(days=d), 1, "click")); k += 1
    for d in range(20, 40):
        for _ in range(12):
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(days=d), 1, "click")); k += 1
    # 'view': flat 3/day over the same span → never detects
    for d in range(40):
        for _ in range(3):
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(days=d), 1, "view")); k += 1
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        },
    ))
    g = _compare("events_page_hinkley", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    d0 = int(pd.Timestamp("2024-01-01").timestamp() // 86400)
    assert int(g.loc["click", "detect_day"]) == d0 + 23  # 4th post-shift day
    assert int(g.loc["view", "detect_day"]) == -1
    assert int(g.loc["view", "max_dev"]) == 0


def test_pq_distortion_zero_on_codewords(tmp_path):
    from sts_opentelemetry_collector_ray.pipelines.queries54 import _pq_codebooks

    books = _pq_codebooks()
    # build 8 vectors whose every 16-dim slice IS a codeword → zero error
    vecs = []
    for i in range(8):
        v = np.concatenate([books[m][(i * (m + 1)) % 16] for m in range(4)])
        vecs.append(v)
    _write(
        str(tmp_path),
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": np.arange(8, dtype=np.int64),
                "embedding": [v.astype(np.float32).tolist() for v in vecs],
                "label": np.zeros(8, np.int32),
            }
        ),
    )
    g = _compare("emb_pq_distortion", str(tmp_path), ["embeddings"]).set_index(
        "subspace"
    )
    # float32 storage rounds the codewords ⇒ distortion is ~0 (≤ 1 micro)
    for m in range(4):
        assert 0 <= int(g.loc[m, "mse_micro"]) <= 1
        assert int(g.loc[m, "n"]) == 8
