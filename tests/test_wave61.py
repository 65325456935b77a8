"""Edge-case tests for wave-61 operators: coverage gaps with a known
zero-run layout (runs at the edge and interior, one gapless type) and ship
latency with hand-placed first-ship picks among multiple lineitems. Ray vs
DuckDB equality is enforced per-query by the strict sweep; these pin
analytic values on tiny adversarial tables."""

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


def test_coverage_gaps_known_runs(tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # global grid spans hours 0..6 (7 hours)
    # type 'a': events in hours 0, 3, 6 -> zero runs [1,2] and [4,5]: 4 zero
    # hours, longest gap 2
    for h in (0, 3, 6):
        rows.append((base + pd.Timedelta(hours=h), "a"))
    # type 'b': events in every hour -> gapless
    for h in range(7):
        rows.append((base + pd.Timedelta(hours=h), "b"))
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.ones(n, np.int64),
            "event_type": [r[1] for r in rows],
            "value": np.zeros(n, np.float64),
            "props": ["{}"] * n,
        }
    )
    _write(str(tmp_path), "events", df)
    g = _compare("events_coverage_gaps", str(tmp_path), ["events"]).set_index(
        "event_type"
    )
    assert int(g.loc["a", "n_hours"]) == 7
    assert int(g.loc["a", "n_zero_hours"]) == 4
    assert int(g.loc["a", "longest_gap_hours"]) == 2
    assert int(g.loc["b", "n_zero_hours"]) == 0
    assert int(g.loc["b", "longest_gap_hours"]) == 0


def test_ship_latency_first_ship_wins(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], np.int64),
            "o_custkey": np.ones(3, np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": np.ones(3, np.float64),
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-01"]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
        }
    )
    li_rows = [
        # order 1: ships on days 5 and 2 -> first ship = 2
        (1, "2024-01-06"),
        (1, "2024-01-03"),
        # order 2: ships day 10
        (2, "2024-01-11"),
        # order 3 (2-HIGH): ships day 1
        (3, "2024-01-02"),
    ]
    nl = len(li_rows)
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in li_rows], np.int64),
            "l_partkey": np.ones(nl, np.int64),
            "l_suppkey": np.ones(nl, np.int64),
            "l_linenumber": np.arange(1, nl + 1, dtype=np.int64),
            "l_quantity": np.ones(nl, np.float64),
            "l_extendedprice": np.ones(nl, np.float64),
            "l_discount": np.zeros(nl, np.float64),
            "l_tax": np.zeros(nl, np.float64),
            "l_returnflag": ["N"] * nl,
            "l_linestatus": ["O"] * nl,
            "l_shipdate": pd.to_datetime([r[1] for r in li_rows]).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "orders", orders)
    _write(str(tmp_path), "lineitem", li)
    g = _compare(
        "orders_ship_latency", str(tmp_path), ["orders", "lineitem"]
    ).set_index("pri")
    # 1-URGENT latencies sorted: [2, 10] -> p50 rank 1 -> 2; p90 rank 2 -> 10
    assert int(g.loc["1-URGENT", "n_orders"]) == 2
    assert int(g.loc["1-URGENT", "p50_days"]) == 2
    assert int(g.loc["1-URGENT", "p90_days"]) == 10
    assert int(g.loc["1-URGENT", "max_days"]) == 10
    assert int(g.loc["2-HIGH", "p50_days"]) == 1
