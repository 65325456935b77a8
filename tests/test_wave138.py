"""Edge-case tests for wave-138 operators: rank-stability Spearman on
hand-built year ladders (preserved order -> +1, reversed -> -1, tie-safe),
and depth-verbosity arithmetic against the raw derived transcripts. The
value contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _write_orders_customers(tmp_path, years, nations, totals):
    n = len(years)
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(n)],
            "c_nationkey": np.asarray(nations, dtype=np.int32),
            "c_acctbal": np.zeros(n),
            "c_mktsegment": ["AUTO"] * n,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.arange(n, dtype=np.int64),
            "o_orderstatus": ["F"] * n,
            "o_totalprice": np.asarray(totals, dtype=np.float64),
            "o_orderdate": pd.to_datetime(
                [f"{y}-06-01" for y in years]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    for name, df in (("customer", cust), ("orders", orders)):
        t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )
        pq.write_table(t, f"{tmp_path}/{name}.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_rank_stability_preserved_and_reversed(tmp_path):
    # 1994: nations 1<2<3 by revenue. 1995 preserves the order (rho = +1),
    # 1996 reverses it (rho vs 1995 = -1).
    years = [1994] * 3 + [1995] * 3 + [1996] * 3
    nations = [1, 2, 3] * 3
    totals = [10.0, 20.0, 30.0, 1.0, 2.0, 3.0, 3.0, 2.0, 1.0]
    _write_orders_customers(tmp_path, years, nations, totals)
    got = _run("nation_rank_stability", tmp_path).set_index("year_from")
    assert int(got.loc[1994, "spearman_micro"]) == 1_000_000
    assert int(got.loc[1995, "spearman_micro"]) == -1_000_000
    assert int(got.loc[1994, "n_nations"]) == 3


def test_rank_stability_all_tied_year_excluded(tmp_path):
    # 1994 has every nation tied -> zero rank variance -> the pair is absent.
    years = [1994] * 3 + [1995] * 3
    nations = [1, 2, 3] * 2
    totals = [5.0, 5.0, 5.0, 1.0, 2.0, 3.0]
    _write_orders_customers(tmp_path, years, nations, totals)
    got = _run("nation_rank_stability", tmp_path)
    assert len(got) == 0


def test_depth_verbosity_reconciles_with_transcripts():
    from sts_opentelemetry_collector_ray.sources.transcripts import (
        TRANSCRIPTS_FROM_EVENTS_SQL,
    )

    got = _run("conv_depth_verbosity", SF).sort_values("turn_idx")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    n_turns, sum_chars = con.execute(
        TRANSCRIPTS_FROM_EVENTS_SQL
        + " SELECT count(*), sum(length(text)) FROM transcripts"
    ).fetchone()
    assert int(got["n_turns"].sum()) == n_turns
    assert int(got["sum_chars"].sum()) == sum_chars
    # turn 0 exists in every conversation: n_turns is maximal there
    assert got["n_turns"].iloc[0] == got["n_turns"].max()
    # averages stay inside [min, max] plausibility and use micro units
    assert (got["avg_chars_micro"] >= 1_000_000).all()  # texts are non-empty
