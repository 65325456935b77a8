"""Edge-case tests for wave-50 operators: zone statuses across all three
classes (pruned/partial/full) and Q-Q mapping on hand-built distributions
with known deciles. Ray vs DuckDB equality is enforced per-query; these pin
analytic values."""

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


def _compare(name: str, sf_dir: str) -> pd.DataFrame:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str)), f"{name}:\n{g}\nvs\n{e}"
    return g


def _events(ids, values, types=None):
    n = len(ids)
    return pd.DataFrame(
        {
            "event_id": np.array(ids, np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": types if types is not None else ["view"] * n,
            "value": values,
            "props": ["{}"] * n,
        }
    )


def test_zonemap_three_statuses(tmp_path):
    # 32 zones over ids 1..64 (2 ids per zone). zone of ids 1-2: values
    # far below 900 (pruned); ids 3-4: straddle (partial); ids 5-6: above
    # (full); rest below → pruned.
    ids = list(range(1, 65))
    values = []
    for i in ids:
        if i in (3, 4):
            values.append(100.0 if i == 3 else 950.0)
        elif i in (5, 6):
            values.append(900.0 if i == 5 else 999.0)
        else:
            values.append(10.0)
    _write(str(tmp_path), "events", _events(ids, values))
    g = _compare("events_zonemap_report", str(tmp_path))
    st = dict(zip(g.zone_id.astype(int), g.status))
    # ids 3,4 → zone (3*32)//65=1, (4*32)//65=1 → partial
    assert st[1] == "partial"
    # ids 5,6 → zone 2 → full (both ≥ 900.00)
    assert st[2] == "full"
    assert st[0] == "pruned"
    assert sum(1 for s in st.values() if s == "pruned") == 30


def test_qq_known_deciles(tmp_path):
    # view: values 1..10 → decile k value = k (ceil rank picks exactly);
    # purchase: values 10,20,..,100 → decile k value = 10k
    ids = list(range(1, 21))
    values = [float(i) for i in range(1, 11)] + [float(10 * i) for i in range(1, 11)]
    types = ["view"] * 10 + ["purchase"] * 10
    _write(str(tmp_path), "events", _events(ids, values, types))
    g = _compare("events_qq_mapping", str(tmp_path))
    for r in g.itertuples():
        k = int(r.decile)
        assert int(r.view_cents) == k * 100
        assert int(r.purchase_cents) == k * 1000
