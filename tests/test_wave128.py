"""Edge-case tests for wave-128 operators: tool-streak run-length accounting
(histogram mass equals the conversations that have at least one tool turn;
streaks never exceed the longest conversation) and quantity-CDF exactness on
a hand-computed table (PMF/CDF micro values, monotone CDF closing at 1e6).
The value contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def test_tool_streaks_mass_and_bounds():
    got = entrymod.queries()["conv_tool_streaks"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert (got["max_streak"] >= 1).all()
    assert (got["n_convs"] > 0).all()
    # histogram mass = conversations with >= 1 tool turn; streak lengths are
    # bounded by the longest conversation
    import duckdb

    from sts_opentelemetry_collector_ray.pipelines.queries import _PARSED_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    (n_tool_convs,) = con.execute(
        _PARSED_SQL
        + "SELECT count(DISTINCT conv_id) FILTER (WHERE role = 'tool') FROM parsed"
    ).fetchone()
    (max_turns,) = con.execute(
        _PARSED_SQL
        + "SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM parsed GROUP BY conv_id)"
    ).fetchone()
    assert int(got["n_convs"].sum()) == n_tool_convs
    assert int(got["max_streak"].max()) <= max_turns


def test_quantity_cdf_exact_on_tiny_table(tmp_path):
    li = pd.DataFrame(
        {
            "l_returnflag": ["N", "N", "N", "N", "R"],
            "l_quantity": np.array([1.0, 1.0, 2.0, 3.0, 5.0]),
        }
    )
    t = pa.Table.from_pandas(li, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")
    got = entrymod.queries()["lineitem_quantity_cdf"](str(tmp_path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    got = got.set_index(["l_returnflag", "quantity"])
    assert int(got.loc[("N", 1), "n"]) == 2
    assert int(got.loc[("N", 1), "share_micro"]) == 500000
    assert int(got.loc[("N", 1), "cdf_micro"]) == 500000
    assert int(got.loc[("N", 2), "cdf_micro"]) == 750000
    assert int(got.loc[("N", 3), "cdf_micro"]) == 1000000
    assert int(got.loc[("R", 5), "share_micro"]) == 1000000
    # CDF monotone within each flag, closing at exactly 1e6
    for _, grp in got.reset_index().groupby("l_returnflag"):
        cdf = grp.sort_values("quantity")["cdf_micro"].to_numpy()
        assert (np.diff(cdf) >= 0).all() and cdf[-1] == 1_000_000
