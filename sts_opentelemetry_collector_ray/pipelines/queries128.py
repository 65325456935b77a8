"""Driver-contract queries, wave 128 — longest consecutive tool-turn streak
per conversation (a tool-loop screen: agent transcripts that chain many tool
calls back-to-back indicate retry storms or multi-step tool plans), and the
per-returnflag quantity PMF/CDF over lineitem (the order-size distribution
an inventory planner reads). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES128: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_tool_streaks — longest consecutive tool-turn run per conversation
# ---------------------------------------------------------------------------


def q_conv_tool_streaks(sf_dir: str):
    """Tool-loop screen: within each conversation's turn order, a streak is a
    maximal run of consecutive turns with role='tool'; the per-conversation
    MAX streak length feeds a corpus histogram (max_streak -> n_convs).
    Conversations with no tool turns are excluded (they have no run). All
    values are exact integers — no float path at all.

    Scale shape: parsed turns co-locate per conversation through ONE
    conv-bucket exchange; per-bucket lexsort + run-length encoding over the
    boolean tool mask emits a bounded (max_streak, n_convs) histogram per
    bucket — <= max-conv-length rows — that folds on the driver."""
    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.parse import parse_stage
    from .queries125 import _conv_bucket_partial

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        return _conv_bucket_partial(t, ("role",))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        m = g["role"].to_numpy(object) == "tool"
        if not m.any():
            return pd.DataFrame(
                {
                    "max_streak": pd.Series([], dtype=np.int64),
                    "n_convs": pd.Series([], dtype=np.int64),
                }
            )
        # run starts: a tool row whose predecessor is absent, non-tool, or
        # belongs to a different conversation
        brk = np.r_[True, (~m[:-1]) | (conv[1:] != conv[:-1])]
        start = m & brk
        run_id = np.cumsum(start) - 1  # valid only where m
        lens = np.bincount(run_id[m])  # length of each run, in start order
        conv_of_run = conv[start]
        mx = (
            pd.DataFrame({"conv": conv_of_run, "len": lens})
            .groupby("conv", sort=False)["len"]
            .max()
        )
        h = mx.value_counts().rename_axis("max_streak").reset_index(name="n_convs")
        return h.astype({"max_streak": np.int64, "n_convs": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= max-conv-length rows per bucket
    )
    if part.empty or "max_streak" not in part.columns:
        return pd.DataFrame(
            {
                "max_streak": pd.Series([], dtype=np.int64),
                "n_convs": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby("max_streak", sort=True)["n_convs"]
        .sum()
        .reset_index()
        .astype({"max_streak": np.int64, "n_convs": np.int64})
    )
    return out[["max_streak", "n_convs"]]


def _tool_streaks_oracle() -> str:
    from .queries import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
, t AS (
  SELECT conv_id, role,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM parsed
),
tool_rows AS (
  SELECT conv_id,
         rn - row_number() OVER (PARTITION BY conv_id ORDER BY rn) AS grp
  FROM t WHERE role = 'tool'
),
runs AS (
  SELECT conv_id, grp, count(*) AS len FROM tool_rows GROUP BY 1, 2
),
mx AS (
  SELECT conv_id, max(len) AS max_streak FROM runs GROUP BY 1
)
SELECT CAST(max_streak AS BIGINT) AS max_streak,
       CAST(count(*) AS BIGINT) AS n_convs
FROM mx GROUP BY 1"""
    )


ORACLES128["conv_tool_streaks"] = _tool_streaks_oracle()


# ---------------------------------------------------------------------------
# lineitem_quantity_cdf — per-returnflag quantity PMF + CDF
# ---------------------------------------------------------------------------


def q_lineitem_quantity_cdf(sf_dir: str):
    """Order-size distribution: quantities round to exact integers
    (floor-half-up — TPC-H quantities are integral doubles), counted per
    (l_returnflag, quantity); the PMF share and the running CDF within each
    returnflag are emitted in micro units (floor-half-up; each is ONE double
    division over exact int64 counts, so both engines compute the identical
    IEEE double).

    Scale shape: per-batch (returnflag, quantity, n) combiner partials — at
    most |flags| x 50 rows per block — fold on the driver; no shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        qty = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        rf = np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False))
        g = (
            pd.DataFrame({"l_returnflag": rf, "quantity": qty, "n": 1})
            .groupby(["l_returnflag", "quantity"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"quantity": np.int64, "n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |flags| x 50 rows per block
    )
    if part.empty:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=object),
                "quantity": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "share_micro": pd.Series([], dtype=np.int64),
                "cdf_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby(["l_returnflag", "quantity"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    tot = out.groupby("l_returnflag")["n"].transform("sum").to_numpy(np.int64)
    cum = out.groupby("l_returnflag")["n"].cumsum().to_numpy(np.int64)
    n = out["n"].to_numpy(np.int64)
    out["share_micro"] = np.floor(
        n.astype(np.float64) / tot.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["cdf_micro"] = np.floor(
        cum.astype(np.float64) / tot.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    for c in ("quantity", "n"):
        out[c] = out[c].astype(np.int64)
    return out[["l_returnflag", "quantity", "n", "share_micro", "cdf_micro"]]


ORACLES128["lineitem_quantity_cdf"] = """
WITH q AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS quantity
  FROM lineitem
),
g AS (
  SELECT l_returnflag, quantity, CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2
)
SELECT l_returnflag, quantity, n,
       CAST(floor(CAST(n AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY l_returnflag) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro,
       CAST(floor(CAST(sum(n) OVER (PARTITION BY l_returnflag
                                    ORDER BY quantity) AS DOUBLE)
                  / CAST(sum(n) OVER (PARTITION BY l_returnflag) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS cdf_micro
FROM g"""


QUERIES128 = {
    "conv_tool_streaks": q_conv_tool_streaks,
    "lineitem_quantity_cdf": q_lineitem_quantity_cdf,
}
