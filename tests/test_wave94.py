"""Edge-case tests for wave-94 operators: Q8 market share (a planted
two-nation economy recovers the exact floor-division share; out-of-region
customers, out-of-window orders and wrong-type parts are excluded) and SCD2
(consecutive repeats collapse, same-ts ties order by event_id, the open
interval carries the 2^62 sentinel and is_current=1). Ray vs DuckDB equality
is enforced per-query by the strict sweep; these pin analytic values on tiny
adversarial tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SENT = 4_611_686_018_427_387_904


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
    # rows: (event_id, ts, user_id, event_type)
    n = len(rows)
    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[2] for r in rows], np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.ones(n, np.float64),
            "props": ["{}"] * n,
        }
    )


def _tpch(tmp_path):
    d = str(tmp_path)
    _write(d, "region", pd.DataFrame({"r_regionkey": np.array([0, 1], np.int32), "r_name": ["ASIA", "EUROPE"]}))
    _write(
        d,
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([2, 7, 3], np.int32),
                "n_name": ["NATION_2", "NATION_7", "NATION_3"],
                "n_regionkey": np.array([0, 0, 1], np.int32),
            }
        ),
    )
    _write(
        d,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2], np.int64),
                "c_name": ["a", "b"],
                "c_nationkey": np.array([2, 3], np.int32),  # cust 2 out of region
                "c_acctbal": np.zeros(2),
                "c_mktsegment": ["X", "X"],
            }
        ),
    )
    _write(
        d,
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": np.array([10, 20], np.int64),
                "s_name": ["s10", "s20"],
                "s_nationkey": np.array([2, 7], np.int32),  # 10 target, 20 not
                "s_acctbal": np.zeros(2),
            }
        ),
    )
    _write(
        d,
        "part",
        pd.DataFrame(
            {
                "p_partkey": np.array([100, 200], np.int64),
                "p_name": ["p", "q"],
                "p_brand": ["B", "B"],
                "p_type": ["ECONOMY", "LARGE"],
                "p_size": np.array([1, 1], np.int32),
                "p_retailprice": np.ones(2),
            }
        ),
    )
    _write(
        d,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([1000, 2000, 3000, 4000], np.int64),
                "o_custkey": np.array([1, 1, 2, 1], np.int64),
                "o_orderstatus": ["F"] * 4,
                "o_totalprice": np.zeros(4),
                # 1000 in 1996, 2000 in 1997, 3000 out-of-region cust,
                # 4000 out of the date window
                "o_orderdate": pd.to_datetime(
                    ["1996-03-01", "1997-06-01", "1996-03-01", "1999-01-01"]
                ).astype("datetime64[us]"),
                "o_orderpriority": ["1-URGENT"] * 4,
            }
        ),
    )
    li = []
    # 1996: target supplier 30.00 at 10% disc, other supplier 70.00 at 0%
    li.append((1000, 100, 10, 1, 30.0, 0.10))
    li.append((1000, 100, 20, 2, 70.0, 0.00))
    # 1996: wrong part type — excluded entirely
    li.append((1000, 200, 10, 3, 500.0, 0.00))
    # 1997: only the target supplier ships → share = 1e6
    li.append((2000, 100, 10, 1, 50.0, 0.00))
    # excluded orders
    li.append((3000, 100, 10, 1, 999.0, 0.00))
    li.append((4000, 100, 10, 1, 999.0, 0.00))
    _write(
        d,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.array([r[0] for r in li], np.int64),
                "l_partkey": np.array([r[1] for r in li], np.int64),
                "l_suppkey": np.array([r[2] for r in li], np.int64),
                "l_linenumber": np.array([r[3] for r in li], np.int32),
                "l_quantity": np.ones(len(li)),
                "l_extendedprice": np.array([r[4] for r in li]),
                "l_discount": np.array([r[5] for r in li]),
                "l_tax": np.zeros(len(li)),
                "l_returnflag": ["N"] * len(li),
                "l_linestatus": ["O"] * len(li),
                "l_shipdate": pd.to_datetime(["1996-03-05"] * len(li)).astype(
                    "datetime64[us]"
                ),
            }
        ),
    )
    return d


def test_q8_share_math(tmp_path):
    d = _tpch(tmp_path)
    g = _compare(
        "q8_market_share",
        d,
        ["lineitem", "orders", "part", "supplier", "customer", "nation", "region"],
    ).set_index("year")
    # 1996: target = 30.00·0.90 = 27.00 → 27_000_000 micro; total 97_000_000
    assert int(g.loc[1996, "nation_micro"]) == 27_000_000
    assert int(g.loc[1996, "total_micro"]) == 97_000_000
    assert int(g.loc[1996, "share_micro"]) == 27_000_000 * 1_000_000 // 97_000_000
    # 1997: target-only year → exact 1e6 share
    assert int(g.loc[1997, "share_micro"]) == 1_000_000
    assert 1999 not in g.index and 1995 not in g.index


def test_scd2_runs_ties_and_current(tmp_path):
    rows = [
        (1, "2024-01-01 09:00", 7, "free"),
        (2, "2024-01-02 09:00", 7, "free"),  # repeat collapses
        (3, "2024-01-03 09:00", 7, "pro"),
        # same-ts tie: eid 4 then 5 → 'pro' run ends at eid-4's ts,
        # 'trial'(4) then 'pro'(5) are two more versions
        (4, "2024-01-04 09:00", 7, "trial"),
        (5, "2024-01-04 09:00", 7, "pro"),
        (6, "2024-01-01 00:00", 8, "solo"),
    ]
    _write(str(tmp_path), "events", _events(rows))
    g = _compare("events_scd2", str(tmp_path), ["events"]).set_index(
        ["user_id", "version"]
    )
    t = lambda s: int(pd.Timestamp(s).value // 1000)
    assert g.loc[(7, 1), "status"] == "free"
    assert int(g.loc[(7, 1), "valid_from_us"]) == t("2024-01-01 09:00")
    assert int(g.loc[(7, 1), "valid_to_us"]) == t("2024-01-03 09:00")
    assert g.loc[(7, 2), "status"] == "pro"
    # tie at 01-04 09:00: trial (eid 4) precedes pro (eid 5); both intervals
    # start at the same instant (zero-length trial)
    assert g.loc[(7, 3), "status"] == "trial"
    assert int(g.loc[(7, 3), "valid_from_us"]) == t("2024-01-04 09:00")
    assert int(g.loc[(7, 3), "valid_to_us"]) == t("2024-01-04 09:00")
    assert g.loc[(7, 4), "status"] == "pro"
    assert int(g.loc[(7, 4), "valid_to_us"]) == SENT
    assert int(g.loc[(7, 4), "is_current"]) == 1
    assert int(g.loc[(7, 1), "is_current"]) == 0
    # single-event user: one current interval
    assert g.loc[(8, 1), "status"] == "solo"
    assert int(g.loc[(8, 1), "is_current"]) == 1
