"""Edge-case tests for wave-45 operators: growth accounting over a
skip-a-week user (resurrected + churned both fire) and the ledger identity;
MMR preferring a diverse point over a redundant near-duplicate. Tiny
adversarial tables run through BOTH the Ray query and its DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write(dirpath, name, df=None, tbl=None):
    import os

    os.makedirs(dirpath, exist_ok=True)
    t = tbl if tbl is not None else pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(t.replace_schema_metadata(None), f"{dirpath}/{name}.parquet")


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


def test_growth_accounting_resurrection_and_churn(tmp_path):
    wk = 7 * 86400
    base = pd.Timestamp("2024-01-04")  # mid-epoch-week start
    rows = []
    eid = 1
    # user 1: weeks 0,1,2 (retained twice); user 2: weeks 0,2 (skip → churn
    # at 1, resurrected at 2); user 3: week 1 only (new at 1, churn at 2)
    for uid, weeks in [(1, [0, 1, 2]), (2, [0, 2]), (3, [1])]:
        for w in weeks:
            rows.append((eid, base + pd.Timedelta(seconds=w * wk), uid))
            eid += 1
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": ["view"] * len(rows),
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df=df)
    g = _compare("events_growth_accounting", str(tmp_path), ["events"])
    g = g.sort_values("week").reset_index(drop=True)
    assert len(g) == 3
    w0, w1, w2 = g.iloc[0], g.iloc[1], g.iloc[2]
    assert (int(w0.new_users), int(w0.retained), int(w0.resurrected), int(w0.churned)) == (2, 0, 0, 0)
    assert (int(w1.new_users), int(w1.retained), int(w1.resurrected), int(w1.churned)) == (1, 1, 0, 1)
    assert (int(w2.new_users), int(w2.retained), int(w2.resurrected), int(w2.churned)) == (0, 1, 1, 1)


def test_mmr_prefers_diverse_over_redundant(tmp_path):
    # query = id 1 = [10, 0]. id 2 = [20, 0] (most relevant, LONG), id 3 =
    # [8.9, 0] (same direction as 2 — sim(3,2) exceeds rel(3), so its MMR
    # score goes negative), id 4 = [0, 6] (orthogonal: score 0 wins).
    vecs = {1: [10.0, 0.0], 2: [20.0, 0.0], 3: [8.9, 0.0], 4: [0.0, 6.0]}
    tbl = pa.table(
        {
            "vec_id": pa.array(list(vecs.keys()), pa.int64()),
            "embedding": pa.array(list(vecs.values()), pa.list_(pa.float32())),
            "label": pa.array([0] * 4, pa.int32()),
        }
    )
    _write(str(tmp_path), "embeddings", tbl=tbl)
    g = _compare("emb_mmr_topk", str(tmp_path), ["embeddings"])
    order = g.sort_values("step").vec_id.astype(int).tolist()
    assert order[0] == 2
    assert order[1] == 4  # diversity beats the redundant near-dup
