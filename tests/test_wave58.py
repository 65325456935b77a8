"""Edge-case tests for wave-58 operators: time-to-convert with non-converting
journeys (no signup / purchase-before-signup) and hand-computed percentile
picks; ABC classification on a table where the 80%/95% boundaries land
exactly ON a part (the <= boundary rule). Ray vs DuckDB equality is enforced
per-query by the strict sweep; these pin analytic values on tiny adversarial
tables."""

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


def _events(rows):
    # rows: (ts_iso, user_id, event_type)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[1] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_time_to_convert_journeys(tmp_path):
    rows = [
        # user 1: converts in 10 s
        ("2024-01-01 00:00:00", 1, "signup"),
        ("2024-01-01 00:00:10", 1, "purchase"),
        # user 2: converts in 100 s (earliest purchase counts, not the later)
        ("2024-01-01 00:00:00", 2, "signup"),
        ("2024-01-01 00:01:40", 2, "purchase"),
        ("2024-01-01 01:00:00", 2, "purchase"),
        # user 3: converts in 1000 s
        ("2024-01-01 00:00:00", 3, "signup"),
        ("2024-01-01 00:16:40", 3, "purchase"),
        # user 4: purchase BEFORE signup -> not converted
        ("2024-01-01 00:10:00", 4, "signup"),
        ("2024-01-01 00:00:00", 4, "purchase"),
        # user 5: purchase, never signed up -> not converted
        ("2024-01-01 00:00:00", 5, "purchase"),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_time_to_convert", str(tmp_path), ["events"]).iloc[0]
    # deltas sorted: [10, 100, 1000]; p50 rank 2 -> 100; p90 rank 3 -> 1000
    assert int(g.n_converted) == 3
    assert int(g.p50_s) == 100
    assert int(g.p90_s) == 1000
    assert int(g.max_s) == 1000


def _lineitem(rows):
    # rows: (l_partkey, price)
    n = len(rows)
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "l_partkey": np.array([r[0] for r in rows], np.int64),
            "l_suppkey": np.ones(n, np.int64),
            "l_linenumber": np.ones(n, np.int64),
            "l_quantity": np.ones(n, np.float64),
            "l_extendedprice": np.array([r[1] for r in rows], np.float64),
            "l_discount": np.zeros(n, np.float64),
            "l_tax": np.zeros(n, np.float64),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
        }
    )


def test_abc_exact_boundaries(tmp_path):
    # revenues 80, 15, 5 (total 100): part 1 cum=80 -> A (<=80 inclusive),
    # part 2 cum=95 -> B (<=95 inclusive), part 3 -> C
    _write(str(tmp_path), "lineitem", _lineitem([(1, 80.0), (2, 15.0), (3, 5.0)]))
    g = _compare("orders_abc_classes", str(tmp_path), ["lineitem"]).set_index(
        "abc"
    )
    assert int(g.loc["A", "n_parts"]) == 1
    assert int(g.loc["A", "revenue_micro"]) == 80_000_000
    assert int(g.loc["B", "n_parts"]) == 1
    assert int(g.loc["B", "revenue_micro"]) == 15_000_000
    assert int(g.loc["C", "n_parts"]) == 1
    assert int(g.loc["C", "revenue_micro"]) == 5_000_000
