"""Edge-case tests for wave-132 operators: Pearson exactness on hand-built
linear / anti-linear tables, and first-response latency on a hand-built
transcript ordering (user before assistant, assistant-first conversations
excluded). The value contract itself is enforced by the parametrized oracle
gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_lineitem_xy(tmp_path, qty, price, status=None):
    n = len(qty)
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.ones(n, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": np.ones(n, dtype=np.int32),
            "l_quantity": np.asarray(qty, dtype=np.float64),
            "l_extendedprice": np.asarray(price, dtype=np.float64),
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["A"] * n,
            "l_linestatus": status if status is not None else ["O"] * n,
            "l_shipdate": pd.to_datetime(["1995-01-01"] * n).astype("datetime64[us]"),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")


def test_pearson_linear_and_anti(tmp_path):
    qty = [1, 2, 3, 4] + [1, 2, 3, 4]
    price = [10.0, 20.0, 30.0, 40.0] + [40.0, 30.0, 20.0, 10.0]
    status = ["O"] * 4 + ["F"] * 4
    _write_lineitem_xy(tmp_path, qty, price, status)
    got = entrymod.queries()["lineitem_pearson"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.set_index("l_linestatus")
    assert int(got.loc["O", "pearson_micro"]) == 1_000_000
    assert int(got.loc["F", "pearson_micro"]) == -1_000_000


def test_pearson_half_correlation_hand_case(tmp_path):
    # x=[1,1,2,2], y=[10,20,10,20] cents [1000,2000,1000,2000]: cov = 0 -> r=0
    _write_lineitem_xy(tmp_path, [1, 1, 2, 2], [10.0, 20.0, 10.0, 20.0])
    got = entrymod.queries()["lineitem_pearson"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert int(got.iloc[0]["pearson_micro"]) == 0


def test_first_response_orders_and_exclusions():
    got = entrymod.queries()["conv_first_response"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) > 0
    # the assistant turn is strictly after the user turn; ts nondecreasing
    assert (got["assistant_turn"] > got["user_turn"]).all()
    assert (got["latency_us"] >= 0).all()
    # one row per conversation
    assert got["conv_id"].is_unique
