"""Edge-case tests for wave-105 operators: adjacent dup (identical
neighbors score 1.0; disjoint neighbors 0; id gaps produce no pair; the
cross-bucket boundary pair at a multiple of the range width is stitched by
the ghost row) and delivery dup rate (same-minute same-user repeats count;
a minute-boundary crossing does not). Ray vs DuckDB equality is enforced
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
    # pairs: (doc_id, text)
    return pd.DataFrame(
        {
            "doc_id": np.array([p[0] for p in pairs], np.int64),
            "text": [p[1] for p in pairs],
            "lang": ["en"] * len(pairs),
            "source": ["s"] * len(pairs),
            "n_chars": np.array([len(p[1]) for p in pairs], np.int64),
        }
    )


def test_adjacent_dup_identity_gap_and_boundary(tmp_path):
    same = "one two three four five six"
    other = "cat dog fox hen owl pig"
    docs = [
        (0, same), (1, same),          # identical pair → 1.0
        (2, other),                    # (1,2) disjoint → 0
        (5, same),                     # gap: (2,5) is NOT a pair
        # boundary: 63 | 64 crosses the 64-wide range bucket edge
        (63, same), (64, same),
    ]
    _write(str(tmp_path), "documents", _docs(docs))
    g = _compare("docs_adjacent_dup", str(tmp_path), ["documents"]).set_index(
        "doc_id"
    )
    assert int(g.loc[0, "jacc_micro"]) == 1_000_000
    assert int(g.loc[1, "jacc_micro"]) == 0
    assert 2 not in g.index and 5 not in g.index  # gaps yield no pair
    assert int(g.loc[63, "jacc_micro"]) == 1_000_000  # ghost-stitched pair
    assert len(g) == 3


def test_delivery_dup_rate_minute_window(tmp_path):
    rows = [
        # user 1: two clicks inside the same minute → 1 dup
        (1, "2024-01-01 10:00:05", 1, "click"),
        (2, "2024-01-01 10:00:55", 1, "click"),
        # crossing the minute boundary → no dup
        (3, "2024-01-01 10:01:05", 1, "click"),
        # different users, same minute → no dup
        (4, "2024-01-01 10:00:05", 2, "view"),
        (5, "2024-01-01 10:00:06", 3, "view"),
    ]
    _write(
        str(tmp_path),
        "events",
        pd.DataFrame(
            {
                "event_id": np.array([r[0] for r in rows], np.int64),
                "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
                "user_id": np.array([r[2] for r in rows], np.int64),
                "event_type": [r[3] for r in rows],
                "value": np.ones(len(rows)),
                "props": ["{}"] * len(rows),
            }
        ),
    )
    g = _compare("events_delivery_dup_rate", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["click", "n_dup"]) == 1
    assert int(g.loc["click", "dup_bp"]) == 1 * 10_000 // 3
    assert int(g.loc["view", "n_dup"]) == 0
