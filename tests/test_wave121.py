"""Edge-case tests for wave-121 operators: Theil inequality (revenue
tracking population gives exactly 0; full concentration in one nation gives
ln(pop/pop_g) scaled shares — hand-computed) and opening roles (the opener
is the FIRST turn by (ts, event_id), and per-conversation openers count
once). Ray vs DuckDB equality is enforced per-query by the strict sweep;
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


def _dims(tmp_path):
    d = str(tmp_path)
    _write(d, "nation", pd.DataFrame(
        {"n_nationkey": np.array([1, 2], np.int32),
         "n_name": ["NATION_A", "NATION_B"],
         "n_regionkey": np.array([0, 0], np.int32)}))
    _write(d, "customer", pd.DataFrame(
        {"c_custkey": np.array([1, 2, 3, 4], np.int64),
         "c_name": ["a", "b", "c", "d"],
         "c_nationkey": np.array([1, 1, 2, 2], np.int32),
         "c_acctbal": np.zeros(4),
         "c_mktsegment": ["M"] * 4}))
    return d


def _orders(d, rows):
    _write(d, "orders", pd.DataFrame(
        {
            "o_orderkey": np.arange(1, len(rows) + 1, dtype=np.int64),
            "o_custkey": np.array([r[0] for r in rows], np.int64),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": np.array([r[1] for r in rows]),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * len(rows)).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * len(rows),
        },
    ))


def test_theil_zero_when_proportional(tmp_path):
    d = _dims(tmp_path)
    # equal population (2/2) and equal revenue (100/100) → Theil = 0
    _orders(d, [(1, 60.0), (2, 40.0), (3, 30.0), (4, 70.0)])
    g = _compare("orders_theil_inequality", d, ["orders", "customer", "nation"])
    assert (g["theil_micro"] == 0).all()
    assert set(g["rev_share_bp"]) == {5000}


def test_theil_concentration(tmp_path):
    d = _dims(tmp_path)
    # all revenue in NATION_A (half the population) → T = 1·ln(1/0.5) = ln 2
    _orders(d, [(1, 80.0), (2, 20.0)])
    g = _compare("orders_theil_inequality", d, ["orders", "customer", "nation"])
    assert abs(int(g.loc[0, "theil_micro"]) / 1e6 - np.log(2.0)) < 2e-6
    byn = g.set_index("nation")
    assert int(byn.loc["NATION_A", "rev_share_bp"]) == 10_000


def test_opening_roles_first_turn(tmp_path):
    rows = [
        # user 5's conversation opens with a click (role user) at 09:00
        (1, "2024-01-01 09:00", 5, "click"),
        (2, "2024-01-01 10:00", 5, "error"),
        # user 6's conversation opens with an error (role tool)
        (3, "2024-01-01 08:00", 6, "error"),
        (4, "2024-01-01 09:30", 6, "click"),
    ]
    _write(str(tmp_path), "events", pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(len(rows)),
            "props": ['{"k": 1}'] * len(rows),
        },
    ))
    g = _compare("conv_opening_roles", str(tmp_path), ["events"]).set_index("role")
    assert int(g.loc["user", "n_convs"]) == 1
    assert int(g.loc["tool", "n_convs"]) == 1
    assert int(g.loc["user", "share_bp"]) == 5000
