"""Driver-contract queries, wave 174 — return rate by discount band (do
discounted lines come back more often?) and the role × tool invocation
matrix over transcripts (who calls what — the simplest capability census).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES174: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_returns_by_discount — return share per discount milli value
# ---------------------------------------------------------------------------


def q_lineitem_returns_by_discount(sf_dir: str):
    """Per discount value in milli units (floor-half-up): line count,
    returned lines (l_returnflag = 'R'), and the return rate in micro units.

    Scale shape: per-batch (milli, n, ret) combiner over the bounded
    discount grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        milli = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ret = (
            np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R"
        ).astype(np.int64)
        g = (
            pd.DataFrame({"discount_milli": milli, "n": 1, "ret": ret})
            .groupby("discount_milli", sort=False, as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "discount_milli": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "n_returned": pd.Series([], dtype=np.int64),
            "return_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("discount_milli", sort=True)
        .agg(n_lines=("n", "sum"), n_returned=("ret", "sum"))
        .reset_index()
    )
    out["return_micro"] = np.floor(
        out["n_returned"].to_numpy(np.float64)
        / out["n_lines"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES174["lineitem_returns_by_discount"] = """
WITH g AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS discount_milli,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(*) FILTER (l_returnflag = 'R') AS BIGINT) AS n_returned
  FROM lineitem GROUP BY 1
)
SELECT discount_milli, n_lines, n_returned,
       CAST(floor(CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS return_micro
FROM g"""


# ---------------------------------------------------------------------------
# conv_role_tool_matrix — who calls what
# ---------------------------------------------------------------------------


def q_conv_role_tool_matrix(sf_dir: str):
    """Per (role, tool) over tool-bearing turns: turn count and the tool's
    share WITHIN the role in micro units.

    Scale shape: per-batch (role, tool, n) combiner over the bounded grid;
    driver fold; no shuffle."""
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        tool = np.asarray(t["tool"].to_numpy(zero_copy_only=False))
        keep = tool != ""
        g = (
            pd.DataFrame(
                {
                    "role": np.asarray(t["role"].to_numpy(zero_copy_only=False))[
                        keep
                    ],
                    "tool": tool[keep],
                    "n": 1,
                }
            )
            .groupby(["role", "tool"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "role": pd.Series([], dtype=object),
            "tool": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int64),
            "in_role_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["role", "tool"], sort=True)["n"]
        .sum()
        .reset_index(name="n_turns")
    )
    rtot = out.groupby("role")["n_turns"].transform("sum")
    out["in_role_micro"] = np.floor(
        out["n_turns"].to_numpy(np.float64)
        / rtot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_turns": np.int64})


def _role_tool_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
g AS (
  SELECT role, tool, CAST(count(*) AS BIGINT) AS n_turns
  FROM transcripts WHERE tool <> ''
  GROUP BY 1, 2
),
rt AS (SELECT role, CAST(sum(n_turns) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT g.role, g.tool, g.n_turns,
       CAST(floor(CAST(g.n_turns AS DOUBLE) / CAST(rt.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_role_micro
FROM g JOIN rt USING (role)"""
    )


ORACLES174["conv_role_tool_matrix"] = _role_tool_oracle()


QUERIES174 = {
    "lineitem_returns_by_discount": q_lineitem_returns_by_discount,
    "conv_role_tool_matrix": q_conv_role_tool_matrix,
}
