"""Edge-case tests for waves 152-158: hand-checkable arithmetic for price
endings, question rate, verbosity ratio, supplier load, volume discount,
rollup shares, latency-by-depth, energy quantiles, first-order premium,
switch cost, revenue trend, and closing roles. Value contracts are enforced
by the parametrized oracle gate; these pin semantics on tiny inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def _write(tmp_path, name, df):
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/{name}.parquet")


def test_cents_endings_hand(tmp_path):
    prices = [1.00, 2.00, 3.99, 4.99]  # endings 0,0,99,99
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.arange(4, dtype=np.int64),
                "o_totalprice": np.asarray(prices),
            }
        ),
    )
    got = _run("orders_cents_endings", tmp_path).set_index("ending")
    assert int(got.loc[0, "n_orders"]) == 2
    assert int(got.loc[99, "share_micro"]) == 500_000
    # dev vs uniform 1/100: 0.5*100 - 1 = 49 -> 49e6
    assert int(got.loc[0, "dev_micro"]) == 49_000_000


def test_question_rate_bounds():
    got = _run("conv_question_rate")
    assert got["question_micro"].between(0, 1_000_000).all()
    assert (got["n_questions"] <= got["n_turns"]).all()


def test_volume_discount_hand(tmp_path):
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.arange(4, dtype=np.int64),
                "l_quantity": np.asarray([1.0, 1.0, 10.0, 10.0]),
                "l_discount": np.asarray([0.00, 0.02, 0.05, 0.07]),
            }
        ),
    )
    got = _run("lineitem_volume_discount", tmp_path).set_index("quantity")
    assert int(got.loc[1, "avg_discount_micro"]) == 10_000  # mean 1%
    assert int(got.loc[10, "avg_discount_micro"]) == 60_000  # mean 6%


def test_region_rollup_shares_sum():
    got = _run("region_revenue_rollup")
    # nation shares within each region sum to ~1e6
    s = got.groupby("r_name")["nation_in_region_micro"].sum()
    assert ((s - 1_000_000).abs() <= got.groupby("r_name").size()).all()
    # region share is constant within a region
    assert (got.groupby("r_name")["region_share_micro"].nunique() == 1).all()


def test_latency_by_depth_consistency():
    got = _run("sg_latency_by_depth")
    assert (got["n_failed"] <= got["n_edges"]).all()
    # avg × n ≈ sum within floor rounding of the micro scale
    approx = got["avg_latency_micro"] * got["n_edges"] / 1_000_000.0
    assert np.allclose(approx, got["sum_latency_us"], rtol=1e-5, atol=1.0)


def test_first_order_premium_hand(tmp_path):
    # cust 1: first 10.00 then 20.00, 30.00 -> avg_first 10, avg_rest 25
    # cust 2: single order -> excluded
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.asarray([1, 2, 3, 4], dtype=np.int64),
                "o_custkey": np.asarray([1, 1, 1, 2], dtype=np.int64),
                "o_orderdate": pd.to_datetime(
                    ["1995-01-01", "1995-02-01", "1995-03-01", "1995-01-01"]
                ).astype("datetime64[us]"),
                "o_totalprice": np.asarray([10.0, 20.0, 30.0, 99.0]),
            }
        ),
    )
    got = _run("customers_first_order_premium", tmp_path)
    assert int(got["n_customers"].iloc[0]) == 1
    assert int(got["avg_first_micro"].iloc[0]) == 1_000_000_000
    assert int(got["avg_rest_micro"].iloc[0]) == 2_500_000_000
    # premium = 1000/2500 = 0.4
    assert int(got["premium_micro"].iloc[0]) == 400_000


def test_revenue_trend_linear(tmp_path):
    # nation 1: revenue 100, 200, 300 over 1994-96 -> slope 100.00/yr
    # = 10000 cents/yr -> 1e10 micro-cents
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.asarray([1], dtype=np.int64),
                "c_nationkey": np.asarray([1], dtype=np.int32),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.arange(3, dtype=np.int64),
                "o_custkey": np.asarray([1, 1, 1], dtype=np.int64),
                "o_orderdate": pd.to_datetime(
                    ["1994-06-01", "1995-06-01", "1996-06-01"]
                ).astype("datetime64[us]"),
                "o_totalprice": np.asarray([100.0, 200.0, 300.0]),
            }
        ),
    )
    got = _run("nation_revenue_trend", tmp_path)
    assert int(got["slope_micro"].iloc[0]) == 10_000_000_000
    assert int(got["n_years"].iloc[0]) == 3


def test_closing_roles_share_sums():
    got = _run("conv_closing_roles")
    assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got)
    assert int(got["n_convs"].sum()) == 15  # sf0.001 conversations
