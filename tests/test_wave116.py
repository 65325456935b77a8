"""Edge-case tests for wave-116 operators: reconciliation (a perfectly
reconciling order, one off by exactly 1% (inside tolerance by ≤) and one
wildly off; a line-less order is excluded) and price points (hand-planted
.00/.99 endings count exactly; 0.995 rounds half-up to a .00 ending). Ray
vs DuckDB equality is enforced per-query by the strict sweep; these pin
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


def test_reconciliation_tolerance_edges(tmp_path):
    d = str(tmp_path)
    _write(d, "orders", pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3, 4], np.int64),
            "o_custkey": np.ones(4, np.int64),
            "o_orderstatus": ["F"] * 4,
            # order 1: exact; order 2: header 100.00 vs lines 99.00 (1% AT
            # tolerance → within); order 3: header 100.00 vs lines 50.00;
            # order 4: no lineitems → excluded
            "o_totalprice": np.array([10.0, 100.0, 100.0, 77.0]),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 4).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * 4,
        },
    ))
    li = [(1, 10.0), (2, 99.0), (3, 50.0)]
    n = len(li)
    _write(d, "lineitem", pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in li], np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.array([r[1] for r in li]),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-02"] * n).astype(
                "datetime64[us]"
            ),
        },
    ))
    g = _compare("orders_amount_reconciliation", d, ["orders", "lineitem"])
    assert int(g.loc[0, "n_orders"]) == 3
    assert int(g.loc[0, "n_within_tol"]) == 2  # exact + at-tolerance
    # MAD = (0 + 100 + 5000) cents / 3 in micro
    assert int(g.loc[0, "mad_micro"]) == (0 + 100 + 5000) * 1_000_000 // 3


def test_price_points_endings(tmp_path):
    vals = [("click", 5.00), ("click", 4.99), ("click", 0.995),  # → 1.00
            ("click", 3.17), ("view", 2.50)]
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.arange(1, len(vals) + 1, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * len(vals)).astype(
                "datetime64[us]"
            ),
            "user_id": np.ones(len(vals), np.int64),
            "event_type": [v[0] for v in vals],
            "value": np.array([v[1] for v in vals], np.float64),
            "props": ["{}"] * len(vals),
        },
    ))
    g = _compare("events_price_points", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    # click: endings 00, 99, 00 (0.995→100 cents), 17 → 2×.00, 1×.99 of 4
    assert int(g.loc["click", "pct00_bp"]) == 2 * 10_000 // 4
    assert int(g.loc["click", "pct99_bp"]) == 1 * 10_000 // 4
    assert int(g.loc["view", "pct00_bp"]) == 0
