"""Edge-case tests for wave-130 operators: Spearman exactness on hand-built
monotone / anti-monotone / tied tables, and turn-dup-rate reconciliation with
the raw events table. The value contract itself is enforced by the
parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_lineitem(tmp_path, qty, disc, flag=None):
    n = len(qty)
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.ones(n, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": np.ones(n, dtype=np.int32),
            "l_quantity": np.asarray(qty, dtype=np.float64),
            "l_extendedprice": np.ones(n),
            "l_discount": np.asarray(disc, dtype=np.float64),
            "l_tax": np.zeros(n),
            "l_returnflag": flag if flag is not None else ["A"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.to_datetime(["1995-01-01"] * n).astype("datetime64[us]"),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")


def test_spearman_monotone_and_anti(tmp_path):
    # strictly increasing discount with quantity -> rho = +1; a second flag
    # strictly decreasing -> rho = -1 (no ties in either column)
    qty = [1, 2, 3, 4, 5] + [1, 2, 3, 4, 5]
    disc = [0.00, 0.01, 0.02, 0.03, 0.04] + [0.04, 0.03, 0.02, 0.01, 0.00]
    flag = ["A"] * 5 + ["R"] * 5
    _write_lineitem(tmp_path, qty, disc, flag)
    got = entrymod.queries()["lineitem_spearman"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.set_index("l_returnflag")
    assert int(got.loc["A", "spearman_micro"]) == 1_000_000
    assert int(got.loc["R", "spearman_micro"]) == -1_000_000
    assert int(got.loc["A", "n_rows"]) == 5


def test_spearman_ties_match_hand_computation(tmp_path):
    # x = [1,1,2], y(cents) = [0,1,1]: doubled avg ranks x -> {1:3, 2:5},
    # y -> {0:1, 1:4}. n=3, sx=11, sy=9, sxx=43, syy=33, sxy=35;
    # num = 3*35 - 99 = 6; dxx = 129-121 = 8; dyy = 99-81 = 18;
    # rho = 6/(sqrt(8)*sqrt(18)) = 0.5 -> 500000 micro.
    _write_lineitem(tmp_path, [1, 1, 2], [0.00, 0.01, 0.01])
    got = entrymod.queries()["lineitem_spearman"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert int(got.loc[got["l_returnflag"] == "A", "spearman_micro"].iloc[0]) == 500_000


def test_spearman_constant_column_excluded(tmp_path):
    # constant discount -> dyy == 0 -> the flag is omitted, not NaN/crash
    _write_lineitem(tmp_path, [1, 2, 3], [0.01, 0.01, 0.01])
    got = entrymod.queries()["lineitem_spearman"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["l_returnflag", "n_rows", "spearman_micro"]


def test_turn_dup_rate_reconciles_with_events():
    got = entrymod.queries()["conv_turn_dup_rate"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert (got["n_distinct"] >= 1).all()
    assert (got["n_distinct"] <= got["n_turns"]).all()
    assert ((got["dup_micro"] >= 0) & (got["dup_micro"] <= 1_000_000)).all()
    # every event becomes exactly one turn
    import duckdb

    con = duckdb.connect()
    (n_events,) = con.execute(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()
    assert int(got["n_turns"].sum()) == int(n_events)
    # roles are the four derivation roles
    assert set(got["role"]) <= {"assistant", "system", "tool", "user"}
