"""Edge-case tests for wave-151 Pareto shares: hand-built distributions with
ties at the cutoff (included by contract) and uniform corner cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_orders_pareto_hand_case(tmp_path):
    # 100 orders: 99 at $1.00, 1 at $100.00 -> rank ceil(99) = 99 -> cutoff
    # 100 cents; ties included -> 100 "top" orders?? No: cumulative at 100
    # cents covers 99 orders; rank 99 lands on the 100-cent bin -> cutoff
    # 100, top = orders >= 100 cents = all 100. Degenerate-tie contract.
    prices = [1.0] * 99 + [100.0]
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(100, dtype=np.int64),
            "o_custkey": np.ones(100, dtype=np.int64),
            "o_totalprice": np.asarray(prices),
            "o_orderdate": pd.to_datetime(["1995-01-01"] * 100).astype(
                "datetime64[us]"
            ),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/orders.parquet")
    got = _run("orders_top1pct_share", tmp_path)
    assert int(got["n_orders"].iloc[0]) == 100
    assert int(got["cutoff_cents"].iloc[0]) == 100
    assert int(got["top_orders"].iloc[0]) == 100
    assert int(got["top_share_micro"].iloc[0]) == 1_000_000


def test_users_pareto_single_whale(tmp_path):
    # 99 users with 1 event, 1 user with 101 events: rank 99 -> cutoff 1 ->
    # everyone top (uniform-ish tie). Use 200 users to isolate the whale:
    # 199 users × 1 event + 1 user × 201 events -> rank ceil(198) = 198
    # lands in the 1-event bin -> cutoff 1. To pin a nontrivial cutoff,
    # make 100 users × 1 and 1 user × 2: rank ceil(99.99)=100 -> bin 1.
    # The deterministic contract is what matters; assert reconciliation.
    users = list(range(199)) + [999] * 201
    n = len(users)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n).astype("datetime64[us]"),
            "user_id": np.asarray(users, dtype=np.int64),
            "event_type": ["x"] * n,
            "value": np.ones(n),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")
    got = _run("users_top1pct_share", tmp_path)
    assert int(got["n_users"].iloc[0]) == 200
    # rank ceil(200·0.99) = 198 -> inside the 1-event bin -> cutoff 1,
    # every user tops, share = 1.0 (documented tie contract)
    assert int(got["cutoff_events"].iloc[0]) == 1
    assert int(got["top_share_micro"].iloc[0]) == 1_000_000
