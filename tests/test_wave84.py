"""Edge-case tests for wave-84 operators: Laspeyres price index (base month
= exactly 1e6; a doubled price doubles the index; parts missing from the
base month are excluded from every month's basket) and HLL error report
(exact distincts pinned; error consistent with the estimate). Ray vs DuckDB
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


def _lineitem(rows):
    # rows: (l_partkey, shipdate, qty, extprice)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "l_partkey": np.array([r[0] for r in rows], np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int64),
            "l_quantity": np.array([r[2] for r in rows], np.float64),
            "l_extendedprice": np.array([r[3] for r in rows], np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )


def test_price_index_base_double_and_matching(tmp_path):
    li = _lineitem(
        [
            # base month 1996-01: part 1 at unit 10 (qty 2), part 2 at unit 5
            (1, "1996-01-10", 2.0, 20.0),
            (2, "1996-01-15", 1.0, 5.0),
            # 1996-02: part 1 doubles to 20, part 2 still 5
            (1, "1996-02-10", 3.0, 60.0),
            (2, "1996-02-12", 2.0, 10.0),
            # 1996-03: only part 3 trades, absent from base -> excluded, den 0
            (3, "1996-03-01", 1.0, 100.0),
        ]
    )
    _write(str(tmp_path), "lineitem", li)
    g = _compare("lineitem_price_index", str(tmp_path), ["lineitem"]).set_index(
        "ship_month"
    )
    assert int(g.loc[199601, "index_micro"]) == 1_000_000  # base = 1.0
    # L(feb) = (20000*2 + 5000*1)/(10000*2 + 5000*1) = 45000/25000 = 1.8
    assert int(g.loc[199602, "index_micro"]) == 1_800_000
    # month with an empty matched basket drops out (documented join contract)
    assert 199603 not in g.index


def test_hll_error_exact_counts(tmp_path):
    n = 200
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="m")
            ).astype("datetime64[us]"),
            "user_id": np.arange(n, dtype=np.int64) % 37,  # 37 distinct users
            "event_type": ["click" if i % 2 == 0 else "view" for i in range(n)],
            "value": np.ones(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", ev)
    g = _compare("events_hll_error", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    # evens: users 0..36 all appear (100 events % 37 covers all) -> 37
    assert int(g.loc["click", "n_exact"]) == 37
    assert int(g.loc["view", "n_exact"]) == 37
    for t in ("click", "view"):
        est = float(g.loc[t, "est_distinct"])
        err = int(g.loc[t, "err_micro"])
        assert err == int(np.floor(abs(est - 37) / 37 * 1e6 + 0.5))
