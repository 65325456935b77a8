"""Edge-case tests for wave-71 operators: CUPED where the pre-period
perfectly predicts the post-period (theta = 1, adjustment removes all
between-arm covariate imbalance) and OLS elasticity on exact-line data
(slope recovered exactly; zero-variance discount -> slope 0). Ray vs DuckDB
equality is enforced per-query by the strict sweep; these pin analytic
values on tiny adversarial tables."""

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


def test_cuped_perfect_covariate(tmp_path):
    # users with x pre-events and y = x post-events (y == x exactly):
    # theta = 1 and each arm's adjusted mean collapses to the GLOBAL pre
    # mean -> both arms report the same adjusted value
    rows = []
    eid = 1
    pre = pd.Timestamp("2024-01-01 00:00:00")
    post = pd.Timestamp("2024-01-03 00:00:00")  # range midpoint = Jan 2
    for u, k in ((1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6)):
        for i in range(k):
            rows.append((pre + pd.Timedelta(minutes=i), u))
            rows.append((post + pd.Timedelta(minutes=i), u))
            eid += 2
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": ["view"] * n,
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_ab_cuped", str(tmp_path), ["events"])
    assert (g["theta_micro"] == 1_000_000).all()
    # y == x => adj = mean_x_all for every arm -> identical adjusted means
    assert g["adj_mean_micro"].nunique() == 1
    assert int(g["n_users"].sum()) == 6


def _lineitem(xy):
    n = len(xy)
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.ones(n, np.int64),
            "l_quantity": np.array([r[1] for r in xy], np.float64),
            "l_extendedprice": np.ones(n, np.float64),
            "l_discount": np.array([r[0] for r in xy], np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
        }
    )


def test_elasticity_exact_line_and_degenerate(tmp_path):
    # qty = 2*pct + 1 exactly: slope = 2.0
    xy = [(0.00, 1.0), (0.05, 11.0), (0.10, 21.0)]
    _write(str(tmp_path / "line"), "lineitem", _lineitem(xy))
    g = _compare(
        "lineitem_discount_elasticity", str(tmp_path / "line"), ["lineitem"]
    ).iloc[0]
    assert int(g.slope_micro) == 2_000_000
    # constant discount -> zero variance -> slope defined as 0
    xy2 = [(0.05, 1.0), (0.05, 9.0)]
    _write(str(tmp_path / "deg"), "lineitem", _lineitem(xy2))
    g2 = _compare(
        "lineitem_discount_elasticity", str(tmp_path / "deg"), ["lineitem"]
    ).iloc[0]
    assert int(g2.slope_micro) == 0
