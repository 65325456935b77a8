"""Edge-case tests for wave-143 operators: lines-per-order histogram on a
hand-built fact table (split orders counted once, revenue attribution) and
line-position profile arithmetic. The value contract itself is enforced by
the parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_lineitem(tmp_path, orders, linenos, prices, qtys=None):
    n = len(orders)
    df = pd.DataFrame(
        {
            "l_orderkey": np.asarray(orders, dtype=np.int64),
            "l_partkey": np.ones(n, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": np.asarray(linenos, dtype=np.int32),
            "l_quantity": (
                np.asarray(qtys, dtype=np.float64)
                if qtys is not None
                else np.ones(n)
            ),
            "l_extendedprice": np.asarray(prices, dtype=np.float64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_linecount_histogram(tmp_path):
    # order 1: 3 lines, order 2: 1 line, order 3: 1 line
    _write_lineitem(
        tmp_path,
        orders=[1, 1, 1, 2, 3],
        linenos=[1, 2, 3, 1, 1],
        prices=[10.0, 20.0, 30.0, 5.0, 7.0],
    )
    got = _run("orders_linecount_profile", tmp_path).set_index("n_lines")
    assert int(got.loc[3, "n_orders"]) == 1
    assert int(got.loc[3, "sum_cents"]) == 6000
    assert int(got.loc[1, "n_orders"]) == 2
    assert int(got.loc[1, "sum_cents"]) == 1200
    # avg for the two 1-line orders: 600 cents -> 600e6 micro-cents
    assert int(got.loc[1, "avg_cents_micro"]) == 600_000_000


def test_linenumber_profile_shares(tmp_path):
    # position 1 carries 75 of 100 total cents -> share 0.75
    _write_lineitem(
        tmp_path,
        orders=[1, 1, 2, 2],
        linenos=[1, 2, 1, 2],
        prices=[0.50, 0.10, 0.25, 0.15],
        qtys=[2.0, 4.0, 2.0, 4.0],
    )
    got = _run("lineitem_linenumber_profile", tmp_path).set_index("l_linenumber")
    assert int(got.loc[1, "sum_cents"]) == 75
    assert int(got.loc[1, "share_micro"]) == 750_000
    assert int(got.loc[2, "share_micro"]) == 250_000
    assert int(got.loc[1, "avg_qty_milli"]) == 2000
    assert int(got.loc[2, "avg_qty_milli"]) == 4000
