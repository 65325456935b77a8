"""Edge-case tests for wave-127 operators: Benford digit extraction at the
10^k string-head cliffs (where a log10-based digit would misfire) and tool
bigram pairing across conversation boundaries (no cross-conv transitions;
shares sum to ~1 per prev_tool). The value contract itself is enforced by
the parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def test_benford_digit_at_power_of_ten_cliffs(tmp_path):
    # values land on exact cents 1, 9, 10, 99, 100, 1000, 999999 plus a zero
    # and a negative (both excluded): string-head digits 1,9,1,9,1,1,9
    vals = [0.01, 0.09, 0.10, 0.99, 1.00, 10.00, 9999.99, 0.0, -5.0]
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": np.ones(len(vals), dtype=np.int64),
            "event_type": ["buy"] * len(vals),
            "value": np.array(vals, dtype=np.float64),
            "props": ["{}"] * len(vals),
        }
    )
    t = pa.Table.from_pandas(ev, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")
    got = entrymod.queries()["events_benford"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    by = got.set_index("digit")
    assert int(by.loc[1, "n"]) == 4  # cents 1, 10, 100, 1000
    assert int(by.loc[9, "n"]) == 3  # cents 9, 99, 999999
    assert int(got["n"].sum()) == 7  # zero/negative excluded
    # expectation constants: log10(2), log10(10/9)
    assert int(by.loc[1, "benford_micro"]) == 301030
    assert int(by.loc[9, "benford_micro"]) == 45757
    # shares partition each event_type
    assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got)


def test_tool_bigrams_shares_and_no_cross_conv():
    got = entrymod.queries()["conv_tool_bigrams"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert (got["n"] > 0).all()
    # conditional shares sum to 1e6 (±1 floor-half-up slack per row) within
    # each prev_tool
    sums = got.groupby("prev_tool")["share_micro"].sum()
    rows = got.groupby("prev_tool")["share_micro"].size()
    assert ((sums - 1_000_000).abs() <= rows).all()
    # total transitions = total tool-call turns minus one per conversation
    # that has at least one call (each conv's call subsequence of length k
    # contributes k-1 pairs)
    import duckdb

    from sts_opentelemetry_collector_ray.pipelines.queries import _PARSED_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    n_calls, n_convs = con.execute(
        _PARSED_SQL
        + "SELECT count(*), count(DISTINCT conv_id) FROM parsed "
        "WHERE role = 'tool' AND tool <> ''"
    ).fetchone()
    assert int(got["n"].sum()) == n_calls - n_convs
