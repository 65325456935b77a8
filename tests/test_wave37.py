"""Edge-case tests for wave-37 operators: audience overlap with a disjoint
type (Jaccard 0) and a universal type; document assembly with duplicate
(linenumber, partkey, cents) rows (identical fragments make any tie order
canonical). Tiny adversarial tables run through BOTH the Ray query and its
DuckDB oracle."""

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


def test_audience_overlap_disjoint_and_universal(tmp_path):
    # users 1-3 do 'view'; users 4-5 do 'click' (disjoint from view);
    # EVERY user does 'error' (universal).
    rows = []
    eid = 0
    for u in [1, 2, 3]:
        rows.append((eid, u, "view")); eid += 1
    for u in [4, 5]:
        rows.append((eid, u, "click")); eid += 1
    for u in [1, 2, 3, 4, 5]:
        rows.append((eid, u, "error")); eid += 1
        rows.append((eid, u, "error")); eid += 1  # duplicates must not matter
    df = pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.ones(len(rows)),
            "props": ["{}"] * len(rows),
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_audience_overlap", str(tmp_path), ["events"])
    m = {(r.type_a, r.type_b): r for r in g.itertuples()}
    d = m[("click", "view")]
    assert int(d.inter) == 0 and int(d.jaccard_micro) == 0
    u = m[("error", "view")]
    assert int(u.inter) == 3 and int(u.uni) == 5 and int(u.jaccard_micro) == 600000


def test_doc_assembly_duplicate_items(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 1], np.int64),
            "l_partkey": np.array([7, 7, 5], np.int64),
            "l_suppkey": np.array([1, 1, 1], np.int64),
            "l_linenumber": np.array([2, 2, 1], np.int32),  # exact dup (2,7)
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [10.0, 10.0, 20.0],
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": pd.to_datetime(["1996-01-01"] * 3).astype("datetime64[us]"),
        }
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare("orders_doc_assembly", str(tmp_path), ["lineitem"])
    rec = g.iloc[0]
    assert int(rec.n_items) == 3
    assert rec.items_json == (
        '[{"ln":1,"pk":5,"cents":2000},'
        '{"ln":2,"pk":7,"cents":1000},{"ln":2,"pk":7,"cents":1000}]'
    )
