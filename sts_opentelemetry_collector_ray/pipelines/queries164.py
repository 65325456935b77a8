"""Driver-contract queries, wave 164 — user acquisition curve (first-seen
users per epoch day plus the cumulative count: the growth curve every
dashboard starts with) and weekly tool mix (tool-call share per epoch week —
the adoption-drift companion to conv_tool_transitions). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES164: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# users_acquisition_curve — first-seen users per day + cumulative
# ---------------------------------------------------------------------------


def q_users_acquisition_curve(sf_dir: str):
    """Per epoch day with at least one first-seen user: the number of users
    whose FIRST event lands that day, and the cumulative user count through
    that day.

    Scale shape: per-batch (user, min_day) combiner, ONE user-bucket
    exchange completes first days, per-bucket (day → n_new) histogram
    partials fold on the driver where the cumulative is a cumsum over the
    bounded day grid."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
        )
        g = (
            pd.DataFrame(
                {
                    "u": t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "day": day,
                }
            )
            .groupby("u", sort=False, as_index=False)["day"]
            .min()
        )
        g["_b"] = (g["u"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"day": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("u", sort=False, as_index=False)["day"].min()
        return (
            first.groupby("day", sort=False)
            .size()
            .reset_index(name="n_new")
            .astype(np.int64)
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "day": pd.Series([], dtype=np.int64),
            "n_new": pd.Series([], dtype=np.int64),
            "cum_users": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "day" not in part.columns:
        return empty
    out = part.groupby("day", sort=True)["n_new"].sum().reset_index()
    out["cum_users"] = np.cumsum(out["n_new"].to_numpy(np.int64))
    return out.astype(np.int64)


ORACLES164["users_acquisition_curve"] = f"""
WITH f AS (
  SELECT user_id, min(epoch_us(ts) // {_DAY_US}) AS day
  FROM events GROUP BY 1
),
g AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1)
SELECT CAST(day AS BIGINT) AS day, n_new,
       CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM g"""


# ---------------------------------------------------------------------------
# tools_weekly_mix — tool-call share per epoch week
# ---------------------------------------------------------------------------


def q_tools_weekly_mix(sf_dir: str):
    """Per (epoch week, tool) over tool-bearing turns: call count and the
    tool's share WITHIN the week in micro units — adoption drift.

    Scale shape: per-batch (week, tool, n) combiner over the bounded grid;
    driver fold; no shuffle."""
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        week = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
            // 7
        )
        tool = np.asarray(t["tool"].to_numpy(zero_copy_only=False))
        keep = tool != ""
        g = (
            pd.DataFrame({"week": week[keep], "tool": tool[keep], "n": 1})
            .groupby(["week", "tool"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"week": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "week": pd.Series([], dtype=np.int64),
            "tool": pd.Series([], dtype=object),
            "n_calls": pd.Series([], dtype=np.int64),
            "in_week_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "week" not in part.columns:
        return empty
    out = (
        part.groupby(["week", "tool"], sort=True)["n"]
        .sum()
        .reset_index(name="n_calls")
    )
    wtot = out.groupby("week")["n_calls"].transform("sum")
    out["in_week_micro"] = np.floor(
        out["n_calls"].to_numpy(np.float64)
        / wtot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"week": np.int64, "n_calls": np.int64})


def _weekly_mix_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + f""",
g AS (
  SELECT epoch_us(ts) // {_DAY_US} // 7 AS week, tool,
         CAST(count(*) AS BIGINT) AS n_calls
  FROM transcripts WHERE tool <> ''
  GROUP BY 1, 2
),
wt AS (SELECT week, CAST(sum(n_calls) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT CAST(g.week AS BIGINT) AS week, g.tool, g.n_calls,
       CAST(floor(CAST(g.n_calls AS DOUBLE) / CAST(wt.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_week_micro
FROM g JOIN wt USING (week)"""
    )


ORACLES164["tools_weekly_mix"] = _weekly_mix_oracle()


QUERIES164 = {
    "users_acquisition_curve": q_users_acquisition_curve,
    "tools_weekly_mix": q_tools_weekly_mix,
}
