"""Driver-contract queries, wave 173 — weekly value mix per event type (the
stacked-area revenue view: exact value cents per (week, type) with
within-week shares) and latency coefficient of variation per tool (stable
vs erratic tools — exact bigint moments over span-pair latencies). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES173: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_weekly_value_mix — value cents per (week, type) with shares
# ---------------------------------------------------------------------------


def q_events_weekly_value_mix(sf_dir: str):
    """Per (epoch week, event type): event count, exact value cents, and the
    type's value share WITHIN the week in micro units.

    Scale shape: per-batch (week, type, n, cents) combiner over the bounded
    grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        week = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
            // 7
        )
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "week": week,
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                    "cents": cents,
                }
            )
            .groupby(["week", "event_type"], sort=False, as_index=False)
            .sum()
        )
        return g.astype({"week": np.int64, "n": np.int64, "cents": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "week": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "in_week_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["week", "event_type"], sort=True)
        .agg(n_events=("n", "sum"), sum_cents=("cents", "sum"))
        .reset_index()
    )
    wtot = out.groupby("week")["sum_cents"].transform("sum")
    out["in_week_micro"] = np.floor(
        out["sum_cents"].to_numpy(np.float64)
        / wtot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(
        {"week": np.int64, "n_events": np.int64, "sum_cents": np.int64}
    )


ORACLES173["events_weekly_value_mix"] = f"""
WITH g AS (
  SELECT epoch_us(ts) // {_DAY_US} // 7 AS week, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events GROUP BY 1, 2
),
wt AS (SELECT week, CAST(sum(sum_cents) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT CAST(g.week AS BIGINT) AS week, g.event_type, g.n_events, g.sum_cents,
       CAST(floor(CAST(g.sum_cents AS DOUBLE) / CAST(wt.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_week_micro
FROM g JOIN wt USING (week)"""


# ---------------------------------------------------------------------------
# sg_latency_cv — latency coefficient of variation per tool
# ---------------------------------------------------------------------------


def q_sg_latency_cv(sf_dir: str):
    """Per tool with >= 2 span-pair calls: call count, exact summed latency
    µs, and the coefficient of variation in micro units — cv =
    sqrt(n·Σl² − (Σl)²) / Σl, every moment an exact bigint.

    Scale shape: the oracled span-pair edge join + a bounded per-tool bigint
    moment combiner (object-int squares); ONE shared double finish."""
    from ..stages.servicegraph import edge_table
    from .queries2 import _parsed_transcripts

    edges = edge_table(_parsed_transcripts(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        lat = t["latency_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "tool": np.asarray(t["tool"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                    "s": lat,
                    "s2": lat.astype(object) * lat,
                }
            )
            .groupby("tool", sort=False, as_index=False)
            .sum()
        )
        return g

    part = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "tool": pd.Series([], dtype=object),
            "n_calls": pd.Series([], dtype=np.int64),
            "sum_latency_us": pd.Series([], dtype=np.int64),
            "cv_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    rows = []
    for tool, g in part.groupby("tool", sort=True):
        n = int(g["n"].sum())
        if n < 2:
            continue
        s = sum(int(v) for v in g["s"])
        s2 = sum(int(v) for v in g["s2"])
        var_num = n * s2 - s * s
        if s == 0:
            continue
        cv = int(
            np.floor(np.sqrt(float(var_num)) / float(s) * 1_000_000.0 + 0.5)
        )
        rows.append((tool, n, s, cv))
    if not rows:
        return empty
    return pd.DataFrame(
        rows, columns=["tool", "n_calls", "sum_latency_us", "cv_micro"]
    ).astype({"n_calls": np.int64, "sum_latency_us": np.int64, "cv_micro": np.int64})


def _latency_cv_oracle() -> str:
    from .queries2 import _EDGES_SQL

    return (
        _EDGES_SQL
        + """,
m AS (
  SELECT tool, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(latency_us AS HUGEINT)) AS HUGEINT) AS s,
         sum(CAST(latency_us AS HUGEINT) * CAST(latency_us AS HUGEINT)) AS s2
  FROM edges GROUP BY 1 HAVING count(*) >= 2
)
SELECT tool,
       CAST(n AS BIGINT) AS n_calls,
       CAST(s AS BIGINT) AS sum_latency_us,
       CAST(floor(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(s AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS cv_micro
FROM m WHERE s > 0"""
    )


ORACLES173["sg_latency_cv"] = _latency_cv_oracle()


QUERIES173 = {
    "events_weekly_value_mix": q_events_weekly_value_mix,
    "sg_latency_cv": q_sg_latency_cv,
}
