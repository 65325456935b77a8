"""Edge-case tests for wave-46 operators: KM with a pre-view purchase (must
not count), a purchase beyond the horizon (censored), everyone-converts-day-0
(survival hits 0 exactly), and a user whose first view and valid purchase sit
in different hash buckets of the same pipeline; Levenshtein pairs at the
threshold boundary. Tiny adversarial tables run through BOTH the Ray query
and its DuckDB oracle."""

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


def test_km_censoring_and_preview_purchase(tmp_path):
    base = pd.Timestamp("2024-03-01")
    day = pd.Timedelta(days=1)
    rows = []
    eid = 1

    def ev(uid, ts, ty):
        nonlocal eid
        rows.append((eid, ts, uid, ty))
        eid += 1

    # user 1: purchase BEFORE view (ignored), then purchase at day 2 → event t=2
    ev(1, base - day, "purchase")
    ev(1, base, "view")
    ev(1, base + 2 * day, "purchase")
    # user 2: purchase at day 40 → beyond horizon → censored at 30
    ev(2, base, "view")
    ev(2, base + 40 * day, "purchase")
    # user 3: view only → censored at 30
    ev(3, base, "view")
    # user 4: converts same day → event t=0
    ev(4, base, "view")
    ev(4, base + pd.Timedelta(hours=1), "purchase")
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_km_survival", str(tmp_path), ["events"])
    m = {int(r.t_day): r for r in g.itertuples()}
    # t=0: 4 at risk, 1 event → S = 0.75; t=2: 3 at risk, 1 event → 0.5
    assert int(m[0].n_risk) == 4 and int(m[0].surv_micro) == 750000
    assert int(m[2].n_risk) == 3 and int(m[2].surv_micro) == 500000
    assert 30 not in m  # censoring produces no event row


def test_typo_pairs_threshold(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], np.int64),
            "text": ["merge marge mergers scan scam wholly_unrelated"],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": np.array([10], np.int64),
        }
    )
    _write(str(tmp_path), "documents", docs)
    g = _compare("docs_typo_pairs", str(tmp_path), ["documents"])
    pairs = {(r.word_a, r.word_b): int(r.dist) for r in g.itertuples()}
    assert pairs[("marge", "merge")] == 1
    assert pairs[("scam", "scan")] == 1
    assert pairs[("merge", "mergers")] == 2
    assert all("wholly_unrelated" not in k for p in pairs for k in p)
