"""Edge-case tests for waves 159-165: self-repetition marking, CVaR tie
inclusion, weekend mask, severity-depth shares, commonness ranks, error
bursts, KS bounds, open aging, latency by outcome, acquisition cumulative,
weekly mix shares, dormancy buckets, shard balance. Value contracts are
enforced by the parametrized oracle gate; these pin semantics on tiny or
real inputs."""

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


def _write_events(tmp_path, ts, users=None, types=None, values=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": (
                np.asarray(users, dtype=np.int64)
                if users is not None
                else np.ones(n, dtype=np.int64)
            ),
            "event_type": types if types is not None else ["x"] * n,
            "value": (
                np.asarray(values, dtype=np.float64)
                if values is not None
                else np.ones(n)
            ),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def test_self_repetition_bounds():
    got = _run("conv_self_repetition")
    assert (got["n_repeats"] < got["n_turns"]).all()
    assert got["repeat_micro"].between(0, 1_000_000).all()


def test_cvar_hand_case(tmp_path):
    # ten values 1..10: p90 rank ceil(9) = 9 -> cutoff 9.00; tail {9,10}
    # -> CVaR = 9.5
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 10,
        values=[float(i) for i in range(1, 11)],
    )
    got = _run("events_cvar", tmp_path)
    assert int(got["cutoff_cents"].iloc[0]) == 900
    assert int(got["tail_n"].iloc[0]) == 2
    assert int(got["cvar_micro"].iloc[0]) == 950_000_000


def test_weekend_lift_uniform(tmp_path):
    # 7 consecutive days once each -> weekend share 2/7, lift exactly 1.0
    _write_events(
        tmp_path, ts=[f"2024-01-0{d}" for d in range(1, 8)]
    )
    got = _run("events_weekend_lift", tmp_path)
    assert int(got["n_weekend"].iloc[0]) == 2
    assert int(got["lift_micro"].iloc[0]) == 1_000_000


def test_severity_by_depth_shares():
    got = _run("conv_severity_by_depth")
    s = got.groupby("depth_bucket")["in_bucket_micro"].sum()
    grp = got.groupby("depth_bucket").size()
    assert ((s - 1_000_000).abs() <= grp).all()


def test_commonness_rank_bounds():
    got = _run("docs_commonness_by_source")
    assert (got["avg_rank_micro"] >= 1_000_000).all()  # rank 1 is the floor
    assert got["oov_share_micro"].between(0, 1_000_000).all()


def test_error_bursts_total():
    got = _run("conv_error_bursts")
    assert int(got["n_convs"].sum()) == 15  # every conversation counted once
    assert (got["burst"] >= 0).all()


def test_length_ks_bounds():
    got = _run("docs_length_ks_by_source")
    assert got["ks_micro"].between(0, 1_000_000).all()
    assert len(got) > 1


def test_open_aging_counts(tmp_path):
    # newest order 2024-01-10 (status F); open orders aged 0 and 3 days
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_orderstatus": ["O", "O", "F"],
            "o_orderdate": pd.to_datetime(
                ["2024-01-10", "2024-01-07", "2024-01-10"]
            ).astype("datetime64[us]"),
            "o_totalprice": np.asarray([1.0, 2.0, 3.0]),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/orders.parquet")
    got = _run("orders_open_aging", tmp_path).set_index("bucket")
    assert int(got.loc[0, "n_orders"]) == 1  # same-day
    assert int(got.loc[2, "n_orders"]) == 1  # age 3 -> bucket 2
    assert int(got["n_orders"].sum()) == 2  # closed order excluded


def test_latency_by_status_outcomes():
    # sf0.001's few paired tool turns all parse as ERROR — assert the
    # contract (valid labels, consistent sums) rather than both outcomes.
    got = _run("sg_latency_by_status")
    assert set(got["status"]) <= {"error", "ok"} and len(got) > 0
    assert (got["n_edges"] > 0).all()
    approx = got["avg_latency_micro"] * got["n_edges"] / 1_000_000.0
    assert np.allclose(approx, got["sum_latency_us"], rtol=1e-5, atol=1.0)


def test_acquisition_cumulative_monotone():
    got = _run("users_acquisition_curve").sort_values("day")
    cum = got["cum_users"].to_numpy(np.int64)
    assert (np.diff(cum) > 0).all() or len(cum) == 1
    assert int(got["n_new"].sum()) == int(cum[-1])


def test_weekly_mix_shares():
    got = _run("tools_weekly_mix")
    s = got.groupby("week")["in_week_micro"].sum()
    grp = got.groupby("week").size()
    assert ((s - 1_000_000).abs() <= grp).all()


def test_dormancy_same_day_bucket(tmp_path):
    # user 1: two events same day (gap 0 -> bucket 0), then +2 days
    # (bucket 2), then +1 day (bucket 1)
    _write_events(
        tmp_path,
        ts=["2024-01-01", "2024-01-01", "2024-01-03", "2024-01-04"],
        users=[1, 1, 1, 1],
    )
    got = _run("users_dormancy_histogram", tmp_path).set_index("bucket")
    assert int(got.loc[0, "n_gaps"]) == 1
    assert int(got.loc[2, "n_gaps"]) == 1
    assert int(got.loc[1, "n_gaps"]) == 1
    assert (got["n_users"] == 1).all()


def test_shard_balance_shares_and_shards():
    got = _run("route_shard_balance")
    assert got["shard_id"].isin([str(i) for i in range(4)]).all()
    s = got.groupby("sink")["in_sink_micro"].sum()
    grp = got.groupby("sink").size()
    assert ((s - 1_000_000).abs() <= grp).all()
