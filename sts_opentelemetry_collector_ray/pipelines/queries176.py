"""Driver-contract queries, wave 176 — nation max-order share (single-order
concentration per nation: one giant order can dominate a small market) and
tool precedence (for each tool pair, which one a conversation reaches for
first — the workflow-ordering census). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES176: dict[str, str] = {}


# ---------------------------------------------------------------------------
# nation_max_order_share — biggest single order vs nation revenue
# ---------------------------------------------------------------------------


def q_nation_max_order_share(sf_dir: str):
    """Per nation: order count, exact revenue cents, the single largest
    order in cents, and its share of the nation total in micro units.

    Scale shape: orders ⋈ customer hash join, per-batch (nation, n, sum,
    max) combiner over the bounded nation grid; driver fold."""
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j = o.join(
        c,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "nk": t["c_nationkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "n": 1,
                    "cents": cents,
                    "mx": cents,
                }
            )
            .groupby("nk", sort=False, as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum"), mx=("mx", "max"))
        )
        return g.astype(np.int64)

    part = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "c_nationkey": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "max_cents": pd.Series([], dtype=np.int64),
            "max_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("nk", sort=True)
        .agg(n_orders=("n", "sum"), sum_cents=("cents", "sum"), max_cents=("mx", "max"))
        .reset_index()
        .rename(columns={"nk": "c_nationkey"})
    )
    out["max_share_micro"] = np.floor(
        out["max_cents"].to_numpy(np.float64)
        / out["sum_cents"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES176["nation_max_order_share"] = """
WITH g AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_cents,
         CAST(max(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS max_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_nationkey, n_orders, sum_cents, max_cents,
       CAST(floor(CAST(max_cents AS DOUBLE) / CAST(sum_cents AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS max_share_micro
FROM g"""


# ---------------------------------------------------------------------------
# conv_tool_precedence — which tool a conversation reaches for first
# ---------------------------------------------------------------------------


def q_conv_tool_precedence(sf_dir: str):
    """For each unordered tool pair (a < b) over conversations using BOTH
    (any tool-bearing turn): how often a's first use precedes b's, how often
    b precedes a (first-use turn ties are impossible — one turn carries one
    tool), and a's precedence share in micro units.

    Scale shape: tool-bearing turns ride ONE conv-bucket exchange;
    per-bucket (conv, tool) first-turn via lexsort + drop_duplicates, one
    self-merge per conversation emits bounded (a, b, a_first) pair partials
    folded on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("tool",))
        df = df[df["tool"] != ""]
        return df[["conv", "turn", "tool", "_b"]]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "tool_a": pd.Series([], dtype=object),
                "tool_b": pd.Series([], dtype=object),
                "a_first": pd.Series([], dtype=np.int64),
                "b_first": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        first = (
            g.sort_values(["conv", "tool", "turn"], kind="mergesort")
            .drop_duplicates(["conv", "tool"])[["conv", "tool", "turn"]]
        )
        m = first.merge(first, on="conv")
        m = m[m["tool_x"] < m["tool_y"]]
        if m.empty:
            return empty
        m["af"] = (m["turn_x"] < m["turn_y"]).astype(np.int64)
        out = (
            m.groupby(["tool_x", "tool_y"], sort=False)
            .agg(a_first=("af", "sum"), n=("af", "size"))
            .reset_index()
        )
        out["b_first"] = out["n"] - out["a_first"]
        return out.rename(columns={"tool_x": "tool_a", "tool_y": "tool_b"})[
            ["tool_a", "tool_b", "a_first", "b_first"]
        ].astype({"a_first": np.int64, "b_first": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "tool_a": pd.Series([], dtype=object),
            "tool_b": pd.Series([], dtype=object),
            "a_first": pd.Series([], dtype=np.int64),
            "b_first": pd.Series([], dtype=np.int64),
            "a_precedence_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "tool_a" not in part.columns:
        return empty
    out = (
        part.groupby(["tool_a", "tool_b"], sort=True)[["a_first", "b_first"]]
        .sum()
        .reset_index()
    )
    tot = (out["a_first"] + out["b_first"]).to_numpy(np.float64)
    out["a_precedence_micro"] = np.floor(
        out["a_first"].to_numpy(np.float64) / tot * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"a_first": np.int64, "b_first": np.int64})


def _precedence_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
f AS (
  SELECT conv_id, tool, min(turn_idx) AS t
  FROM transcripts WHERE tool <> '' GROUP BY 1, 2
),
p AS (
  SELECT a.tool AS tool_a, b.tool AS tool_b,
         CASE WHEN a.t < b.t THEN 1 ELSE 0 END AS af
  FROM f a JOIN f b ON a.conv_id = b.conv_id AND a.tool < b.tool
),
g AS (
  SELECT tool_a, tool_b,
         CAST(sum(af) AS BIGINT) AS a_first,
         CAST(count(*) - sum(af) AS BIGINT) AS b_first
  FROM p GROUP BY 1, 2
)
SELECT tool_a, tool_b, a_first, b_first,
       CAST(floor(CAST(a_first AS DOUBLE)
                  / CAST(a_first + b_first AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS a_precedence_micro
FROM g"""
    )


ORACLES176["conv_tool_precedence"] = _precedence_oracle()


QUERIES176 = {
    "nation_max_order_share": q_nation_max_order_share,
    "conv_tool_precedence": q_conv_tool_precedence,
}
