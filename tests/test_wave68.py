"""Edge-case tests for wave-68 operators: cross-correlation on a constructed
exact-lag pair (purchase = click shifted 2 hours -> xcorr peaks at lag 2
with value 1.0) and return rates with an all-returned brand and a boundary
half-up rounding case. Ray vs DuckDB equality is enforced per-query by the
strict sweep; these pin analytic values on tiny adversarial tables."""

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


def test_xcorr_exact_lag_two(tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    # clicks per hour 0..7: [3,1,4,1,5,9,2,6]; purchases = same pattern
    # shifted +2 hours. On the overlap, b[i+2] == a[i] exactly.
    pattern = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = []
    for h, c in enumerate(pattern):
        for i in range(c):
            rows.append((base + pd.Timedelta(hours=h, minutes=i), "click"))
    for h, c in enumerate(pattern):
        for i in range(c):
            rows.append((base + pd.Timedelta(hours=h + 2, minutes=i), "purchase"))
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
    g = _compare("events_xcorr", str(tmp_path), ["events"]).set_index("lag")
    # the peak must be at lag 2, and above every other lag
    peak = int(g["xcorr_micro"].idxmax())
    assert peak == 2
    assert int(g.loc[2, "xcorr_micro"]) > int(g.loc[0, "xcorr_micro"])
    assert int(g.loc[2, "xcorr_micro"]) > int(g.loc[5, "xcorr_micro"])
    assert int(g.loc[2, "n_hours"]) == 10


def test_returns_by_brand_rates(tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], np.int64),
            "p_name": ["a", "b", "c"],
            "p_brand": ["Brand#11", "Brand#22", "Brand#33"],
            "p_type": ["STANDARD"] * 3,
            "p_size": np.ones(3, np.int32),
            "p_retailprice": np.ones(3, np.float64),
        }
    )
    # Brand#11: 2/2 returned -> 10000 bp; Brand#22: 1/3 -> 3333.33 -> 3333
    # (half-up on .33 stays 3333); Brand#33: 1/2 -> 5000
    li_rows = [
        (1, "R"), (1, "R"),
        (2, "R"), (2, "N"), (2, "N"),
        (3, "R"), (3, "N"),
    ]
    nl = len(li_rows)
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, nl + 1, dtype=np.int64),
            "l_partkey": np.array([r[0] for r in li_rows], np.int64),
            "l_suppkey": np.ones(nl, np.int64),
            "l_linenumber": np.ones(nl, np.int64),
            "l_quantity": np.ones(nl, np.float64),
            "l_extendedprice": np.ones(nl, np.float64),
            "l_discount": np.zeros(nl, np.float64),
            "l_tax": np.zeros(nl, np.float64),
            "l_returnflag": [r[1] for r in li_rows],
            "l_linestatus": ["O"] * nl,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * nl).astype(
                "datetime64[us]"
            ),
        }
    )
    _write(str(tmp_path), "part", part)
    _write(str(tmp_path), "lineitem", li)
    g = _compare("returns_by_brand", str(tmp_path), ["part", "lineitem"]).set_index(
        "p_brand"
    )
    assert int(g.loc["Brand#11", "return_rate_bp"]) == 10_000
    assert int(g.loc["Brand#22", "return_rate_bp"]) == 3_333
    assert int(g.loc["Brand#33", "return_rate_bp"]) == 5_000
    assert int(g.loc["Brand#22", "n_returned"]) == 1
