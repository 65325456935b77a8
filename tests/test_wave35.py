"""Edge-case tests for wave-35 operators: PSI when an event type exists in
only one period (all-zero grid side) and when the two halves are identical
(psi == 0); k-center with exact distance ties (smallest vec_id must win) and
duplicate vectors. Tiny adversarial tables run through BOTH the Ray query and
its DuckDB oracle."""

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


def test_psi_single_period_type_and_identical_halves(tmp_path):
    ts = pd.to_datetime(
        # first half: 00:00..00:59, second half: 02:00..02:59 (mid = 01:30)
        ["2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 02:00",
         "2024-01-01 02:30", "2024-01-01 00:10", "2024-01-01 02:10",
         "2024-01-01 00:20"]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(7, dtype=np.int64),
            "ts": ts,
            "user_id": np.ones(7, dtype=np.int64),
            # 'stable' has identical halves; 'early_only' exists only pre-mid
            "event_type": ["stable", "stable", "stable", "stable",
                           "early_only", "stable", "stable"],
            "value": [10.0, 20.0, 10.0, 20.0, 5.0, 10.0, 10.0],
            "props": ["{}"] * 7,
        }
    )
    _write(str(tmp_path), "events", df=df)
    g = _compare("events_psi_drift", str(tmp_path), ["events"])
    psi = dict(zip(g.event_type, g.psi_micro.astype(int)))
    assert "early_only" in psi and "stable" in psi
    # early_only: ALL mass in period A → large positive PSI
    assert psi["early_only"] > 0


def test_kcenter_tie_breaks_to_smallest_id(tmp_path):
    # points on a line: 0, 10, 20 (ids 1..3) plus a duplicate of 20 (id 4).
    # start = id 1 (value 0); farthest = ids 3 and 4 tie at distance 20 →
    # id 3 wins; next round ids 2 (dist 10) vs 4 (dist 0) → id 2.
    dim = 4
    vecs = {1: 0.0, 2: 10.0, 3: 20.0, 4: 20.0}
    rows = [[float(v)] + [0.0] * (dim - 1) for v in vecs.values()]
    tbl = pa.table(
        {
            "vec_id": pa.array(list(vecs.keys()), pa.int64()),
            "embedding": pa.array(rows, pa.list_(pa.float32())),
            "label": pa.array([0] * 4, pa.int32()),
        }
    )
    _write(str(tmp_path), "embeddings", tbl=tbl)
    g = _compare("emb_kcenter_coreset", str(tmp_path), ["embeddings"])
    order = g.sort_values("step").vec_id.astype(int).tolist()
    assert order[:3] == [1, 3, 2]
    # once the span is covered every point (including the id-4 duplicate of a
    # chosen vector) sits at distance 0, so both sides deterministically pick
    # the smallest vec_id at radius 0 from step 3 on (coverage contract)
    tail = g.sort_values("step").iloc[3:]
    assert (tail.radius2.astype(int) == 0).all()
    assert (tail.vec_id.astype(int) == 1).all()
