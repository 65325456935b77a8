"""Edge-case tests for wave-110 operators: supplier scorecard (a supplier
that wins every metric ranks first; rank ties break by suppkey; composite
ordering is stable) and mix-shift (mix + within telescope exactly to the
YoY delta when the priority sets match; a priority missing in one year is
excluded by contract). Ray vs DuckDB equality is enforced per-query by the
strict sweep; these pin analytic values."""

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


def test_scorecard_dominant_supplier(tmp_path):
    # supplier 1: high revenue, no returns, no discount → rank 1 everywhere
    li = [
        (1, 1, 1000.0, 0.00, "N"),
        (2, 2, 100.0, 0.05, "R"),
        (3, 3, 100.0, 0.05, "N"),
    ]
    n = len(li)
    _write(str(tmp_path), "lineitem", pd.DataFrame(
        {
            "l_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "l_partkey": np.ones(n, np.int64),
            "l_suppkey": np.array([r[1] for r in li], np.int64),
            "l_linenumber": np.arange(1, n + 1, dtype=np.int32),
            "l_quantity": np.ones(n),
            "l_extendedprice": np.array([r[2] for r in li]),
            "l_discount": np.array([r[3] for r in li]),
            "l_tax": np.zeros(n),
            "l_returnflag": [r[4] for r in li],
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
        },
    ))
    g = _compare("supplier_scorecard", str(tmp_path), ["lineitem"]).set_index(
        "suppkey"
    )
    assert int(g.loc[1, "composite"]) == 3  # rank 1 on all three metrics
    assert g.index[0] == 1
    # suppliers 2 and 3 tie on revenue and discount → suppkey breaks ties
    assert int(g.loc[2, "rank_rev"]) == 2 and int(g.loc[3, "rank_rev"]) == 3
    # supplier 2 returned its line → worst return rank
    assert int(g.loc[2, "rank_ret"]) == 3


def test_mix_shift_telescoping(tmp_path):
    rows = [
        # 1996: URGENT 2×100.00 (m=100), LOW 2×50.00 (m=50) → avg 75
        (1, "URGENT", "1996-03-01", 100.0), (2, "URGENT", "1996-04-01", 100.0),
        (3, "LOW", "1996-05-01", 50.0), (4, "LOW", "1996-06-01", 50.0),
        # 1997: URGENT 3×120.00, LOW 1×50.00 → avg 102.5 (mix AND within move)
        (5, "URGENT", "1997-03-01", 120.0), (6, "URGENT", "1997-04-01", 120.0),
        (7, "URGENT", "1997-05-01", 120.0), (8, "LOW", "1997-06-01", 50.0),
        # a 1997-only priority is excluded by contract
        (9, "ODD", "1997-07-01", 999.0),
    ]
    _write(str(tmp_path), "orders", pd.DataFrame(
        {
            "o_orderkey": np.array([r[0] for r in rows], np.int64),
            "o_custkey": np.ones(len(rows), np.int64),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": np.array([r[3] for r in rows]),
            "o_orderdate": pd.to_datetime([r[2] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": [r[1] for r in rows],
        },
    ))
    g = _compare("orders_mix_shift", str(tmp_path), ["orders"]).set_index("priority")
    assert "ODD" not in g.index
    from fractions import Fraction

    # shares use FULL-year totals by contract: 1996 n=4, 1997 n=5 (ODD
    # counts in the denominator even though its row is excluded)
    mix_u = (Fraction(3, 5) - Fraction(1, 2)) * 10000
    within_u = Fraction(3, 5) * (12000 - 10000)
    mix_l = (Fraction(1, 5) - Fraction(1, 2)) * 5000
    within_l = Fraction(1, 5) * 0
    assert int(g.loc["URGENT", "mix_micro"]) == int(mix_u * 1_000_000)
    assert int(g.loc["URGENT", "within_micro"]) == int(within_u * 1_000_000)
    assert int(g.loc["LOW", "mix_micro"]) == int(mix_l * 1_000_000)
    assert int(g.loc["LOW", "within_micro"]) == int(within_l * 1_000_000)
    # per priority, mix + within telescopes to share₂·m₂ − share₁·m₁
    for pri, n1p, m1, n2p, m2 in (
        ("URGENT", 2, 10000, 3, 12000),
        ("LOW", 2, 5000, 1, 5000),
    ):
        lhs = (
            Fraction(int(g.loc[pri, "mix_micro"]) + int(g.loc[pri, "within_micro"]))
        )
        rhs = (Fraction(n2p, 5) * m2 - Fraction(n1p, 4) * m1) * 1_000_000
        assert abs(lhs - rhs) <= 2  # two independent micro floors
