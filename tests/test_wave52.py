"""Edge-case tests for wave-52 operators: watermark lateness with a known
late pattern (including a carry-in across event_id range buckets) and RFM
tiles on hand-built quintile/tie tables. Ray vs DuckDB equality is enforced
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
    # rows: (event_id, ts_iso, event_type)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def test_late_arrivals_known_pattern(tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", "a"),
        (2, "2024-01-01 10:10:00", "a"),
        (3, "2024-01-01 10:00:00", "a"),  # 10 min behind watermark -> late
        (4, "2024-01-01 10:06:00", "b"),  # 4 min behind -> on time (<= 5 min)
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_late_arrivals", str(tmp_path), ["events"])
    a = g[g.event_type == "a"].iloc[0]
    b = g[g.event_type == "b"].iloc[0]
    assert (int(a.n_events), int(a.n_late), int(a.max_late_us)) == (3, 1, 600_000_000)
    assert (int(b.n_events), int(b.n_late), int(b.max_late_us)) == (1, 0, 0)


def test_late_arrivals_carry_across_buckets(tmp_path):
    # event_ids 1 and 70_000 land in different 65_536-wide range buckets;
    # the late verdict for the second bucket needs the first bucket's max.
    rows = [
        (1, "2024-01-01 12:00:00", "x"),
        (70_000, "2024-01-01 11:00:00", "x"),  # 1 h behind carry-in watermark
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_late_arrivals", str(tmp_path), ["events"])
    rec = g.iloc[0]
    assert (int(rec.n_events), int(rec.n_late), int(rec.max_late_us)) == (
        2,
        1,
        3_600_000_000,
    )


def _orders(rows):
    # rows: (o_orderkey, o_custkey, o_totalprice, date_iso)
    n = len(rows)
    return pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.array([r[1] for r in rows], np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.array([r[2] for r in rows], np.float64),
            "o_orderdate": pd.to_datetime([r[3] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )


def test_rfm_distinct_quintiles(tmp_path):
    # 5 customers, strictly ordered on every dimension -> tiles 1..5
    rows = [
        (i, c, 100.0 * (6 - c), f"2024-01-0{6 - c}")
        for c in range(1, 6)
        for i in [c]
    ]
    # customer 1 spends 500 on Jan 5 (best); customer 5 spends 100 on Jan 1
    _write(str(tmp_path), "orders", _orders(rows))
    g = _compare("customer_rfm", str(tmp_path), ["orders"]).sort_values(
        "o_custkey"
    )
    assert list(g.r_tile) == [1, 2, 3, 4, 5]
    assert list(g.m_tile) == [1, 2, 3, 4, 5]
    # frequency all-equal -> everyone ties into tile 1 (zero better)
    assert list(g.f_tile) == [1, 1, 1, 1, 1]
    assert list(g.rfm) == [111, 212, 313, 414, 515]


def test_rfm_ties_share_tile(tmp_path):
    # two customers identical on every dimension, two strictly worse
    rows = [
        (1, 1, 300.0, "2024-01-05"),
        (2, 2, 300.0, "2024-01-05"),
        (3, 3, 200.0, "2024-01-03"),
        (4, 4, 100.0, "2024-01-01"),
    ]
    _write(str(tmp_path), "orders", _orders(rows))
    g = _compare("customer_rfm", str(tmp_path), ["orders"]).sort_values(
        "o_custkey"
    )
    assert list(g.m_tile) == [1, 1, 3, 4]  # ties share; next rank skips
    assert list(g.r_tile) == [1, 1, 3, 4]
