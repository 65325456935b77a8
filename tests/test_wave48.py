"""Edge-case tests for wave-48 operators: Gini = 0 on perfectly equal spend
and the analytic value on a one-whale distribution; Benford with a single
digit dominating. Ray vs DuckDB equality is enforced per-query by the strict
sweep; these pin analytic values on tiny adversarial tables."""

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


def _events(user_values):
    rows = [(u, v) for u, vs in user_values.items() for v in vs]
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], np.int64),
            "event_type": ["purchase"] * n,
            "value": [r[1] for r in rows],
            "props": ["{}"] * n,
        }
    )


def test_gini_equal_and_whale(tmp_path):
    # equal spend → Gini 0
    _write(str(tmp_path / "eq"), "events", _events({1: [10.0], 2: [10.0], 3: [10.0]}))
    g = _compare("events_spend_gini", str(tmp_path / "eq"), ["events"])
    assert int(g.gini_micro.iloc[0]) == 0
    # one whale holds everything among 4 users: G = (n-1)/n = 0.75
    _write(
        str(tmp_path / "wh"),
        "events",
        _events({1: [0.0], 2: [0.0], 3: [0.0], 4: [100.0]}),
    )
    g2 = _compare("events_spend_gini", str(tmp_path / "wh"), ["events"])
    assert int(g2.gini_micro.iloc[0]) == 750000


def test_benford_single_digit_spike(tmp_path):
    # all order totals lead with digit 1 → obs concentrated, chi2 > 0
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 21, dtype=np.int64),
            "o_custkey": np.ones(20, np.int64),
            "o_orderstatus": ["O"] * 20,
            "o_totalprice": np.full(20, 123.45),
            "o_orderdate": pd.to_datetime(["1996-01-01"] * 20).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1"] * 20,
        }
    )
    _write(str(tmp_path), "orders", df)
    g = _compare("orders_benford_audit", str(tmp_path), ["orders"])
    m = dict(zip(g.digit.astype(int), g.obs.astype(int)))
    assert m[1] == 20 and all(m[d] == 0 for d in range(2, 10))
    assert int(g.chi2_micro.iloc[0]) > 0
