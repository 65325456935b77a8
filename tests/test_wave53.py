"""Edge-case tests for wave-53 operators: ACF on a constant series (zero
variance → all-zero ACF) and a hand-computed period-2 series with a zero-fill
gap; Hill estimator on exact powers of ten (closed-form 2·ln10). Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin analytic
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


def _events(hour_list):
    # one event per entry, placed at the given hour offset from a fixed epoch
    base = pd.Timestamp("2024-01-01 00:00:00")
    n = len(hour_list)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(
                [base + pd.Timedelta(hours=h) for h in hour_list]
            ).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": ["a"] * n,
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_acf_constant_series_is_zero(tmp_path):
    # one event in each of hours 0,1,2 -> zero variance -> ACF 0 everywhere
    _write(str(tmp_path), "events", _events([0, 1, 2]))
    g = _compare("events_acf", str(tmp_path), ["events"])
    assert len(g) == 24
    assert (g.acf_micro == 0).all()
    assert (g.n_hours == 3).all()


def test_acf_period2_with_zero_fill_gap(tmp_path):
    # events at hours 0 and 2 (two each), hour 1 empty -> x = [2, 0, 2]
    # d = n*x - S = [2, -4, 2], den = 24
    # lag1 = (-8 - 8)/24 = -2/3; lag2 = 4/24 = 1/6; lag>=3 = 0
    _write(str(tmp_path), "events", _events([0, 0, 2, 2]))
    g = _compare("events_acf", str(tmp_path), ["events"]).set_index("lag")
    assert int(g.loc[1, "acf_micro"]) == -666667  # floor(-2/3*1e6 + .5)
    assert int(g.loc[2, "acf_micro"]) == 166667  # floor(1/6*1e6 + .5)
    assert int(g.loc[3, "acf_micro"]) == 0
    assert int(g.loc[1, "n_hours"]) == 3


def _orders(prices):
    n = len(prices)
    return pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "o_custkey": np.ones(n, np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.array(prices, np.float64),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )


def test_hill_powers_of_ten(tmp_path):
    # cents [10000, 1000, 1000, 100, 10]: k = 4, x_(k+1) = 10
    # H = (ln1000 + ln100 + ln100 + ln10)/4 = 2 ln 10
    _write(str(tmp_path), "orders", _orders([100.0, 10.0, 10.0, 1.0, 0.10]))
    g = _compare("orders_hill_tail", str(tmp_path), ["orders"]).iloc[0]
    assert int(g.n_tail) == 4
    assert int(g.x_tail_cents) == 10
    assert int(g.hill_micro) == int(np.floor(2 * np.log(10.0) * 1e6 + 0.5))
    assert int(g.alpha_micro) == int(np.floor(1 / (2 * np.log(10.0)) * 1e6 + 0.5))
