"""Edge-case tests for waves 145-150: lifespan bucketing, dedup yield
monotonicity, quantile-drift keys, spend quantiles, partition-balance
deviation, byte metering, Fano extremes, balance quantiles. The value
contracts are enforced by the parametrized oracle gate; these pin the
hand-checkable arithmetic."""

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


def test_lifespan_buckets(tmp_path):
    # u1: one day -> bucket 0; u2: span 3 days -> bucket 2 (2 < 3 <= 4);
    # u3: span 1 day -> bucket 1.
    _write_events(
        tmp_path,
        ts=[
            "2024-01-01",                      # u1
            "2024-01-01", "2024-01-04",        # u2: span 3
            "2024-01-01", "2024-01-02",        # u3: span 1
        ],
        users=[1, 2, 2, 3, 3],
    )
    got = _run("users_lifespan_histogram", tmp_path).set_index("bucket")
    assert int(got.loc[0, "n_users"]) == 1
    assert int(got.loc[2, "n_users"]) == 1
    assert int(got.loc[1, "n_users"]) == 1
    assert int(got.loc[2, "n_events"]) == 2


def test_dedup_yield_curve_monotone():
    got = _run("docs_dedup_yield_curve").sort_values("threshold_micro")
    n = got["n_pairs"].to_numpy(np.int64)
    d = got["n_docs"].to_numpy(np.int64)
    assert (n[:-1] >= n[1:]).all() and (d[:-1] >= d[1:]).all()
    assert n[0] > 0  # sf0.001 has near-dup pairs at 0.5


def test_quantile_drift_shape():
    got = _run("events_quantile_drift")
    assert set(got["q_label"]) == {"p50", "p90"}
    piv = got.pivot_table(
        index=["event_type", "week"], columns="q_label", values="value"
    )
    assert (piv["p90"] >= piv["p50"]).all()


def test_spend_quantiles_hand_case(tmp_path):
    # three users with lifetime totals 1.00, 2.00, 10.00:
    # p50 rank ceil(3/2)=2 -> 2.00; p90 rank ceil(2.7)=3 -> 10.00
    _write_events(
        tmp_path,
        ts=["2024-01-01"] * 4,
        users=[1, 2, 3, 3],
        values=[1.0, 2.0, 5.0, 5.0],
    )
    got = _run("users_spend_quantiles", tmp_path).set_index("q_label")
    assert float(got.loc["p50", "value"]) == 2.0
    assert float(got.loc["p90", "value"]) == 10.0
    assert int(got.loc["p50", "n_users"]) == 3


def test_partition_balance_sums_to_corpus():
    got = _run("docs_partition_balance")
    assert int(got["n_docs"].sum()) == 500
    # deviations average out: Σ n·dev ≈ 0 within floor rounding
    assert got["bucket"].between(0, 63).all()


def test_bytes_by_type_shares_sum():
    got = _run("events_bytes_by_type")
    assert len(got) > 0
    # shares sum to ~1e6 (floor rounding)
    assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got)
    # bytes >= n_events × (len('{"k": 0}') + min type length)
    assert (got["sum_bytes"] > got["n_events"] * 8).all()


def test_fano_poisson_like_and_constant(tmp_path):
    # constant 2/hour over 3 hours -> variance 0 -> fano 0
    ts = (
        ["2024-01-01 00:10", "2024-01-01 00:20"]
        + ["2024-01-01 01:10", "2024-01-01 01:20"]
        + ["2024-01-01 02:10", "2024-01-01 02:20"]
    )
    _write_events(tmp_path, ts=ts)
    got = _run("events_fano_factor", tmp_path)
    assert int(got["fano_micro"].iloc[0]) == 0
    assert int(got["n_hours"].iloc[0]) == 3


def test_balance_quantiles_ordering():
    got = _run("customer_balance_quantiles")
    piv = got.pivot(index="c_nationkey", columns="q_label", values="value")
    assert (piv["p90"] >= piv["p50"]).all()
