"""Driver-contract queries, wave 170 — tool-argument failure rates (per
(tool, argument) parsed from call signatures: which argument families fail?)
and order-calendar continuity (active days, missing days, longest gap — the
ingest-continuity audit). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES170: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# tools_arg_failure — failure rate per parsed (tool_name, call_arg)
# ---------------------------------------------------------------------------


def q_tools_arg_failure(sf_dir: str):
    """Per parsed (tool_name, call_arg) over turns carrying a call
    signature: calls, calls whose turn parses as ERROR severity, and the
    failure rate in micro units.

    Scale shape: the oracled parse stage + a bounded (tool, arg, severity)
    combiner; driver fold; no shuffle."""
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        tn = np.asarray(t["tool_name"].to_numpy(zero_copy_only=False))
        keep = pd.notna(tn)
        g = (
            pd.DataFrame(
                {
                    "tool_name": tn[keep],
                    "call_arg": np.asarray(
                        t["call_arg"].to_numpy(zero_copy_only=False)
                    )[keep],
                    "n": 1,
                    "err": (
                        np.asarray(t["severity"].to_numpy(zero_copy_only=False))[
                            keep
                        ]
                        == "ERROR"
                    ).astype(np.int64),
                }
            )
            .groupby(["tool_name", "call_arg"], sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "err": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "tool_name": pd.Series([], dtype=object),
            "call_arg": pd.Series([], dtype=object),
            "n_calls": pd.Series([], dtype=np.int64),
            "n_errors": pd.Series([], dtype=np.int64),
            "failure_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["tool_name", "call_arg"], sort=True)
        .agg(n_calls=("n", "sum"), n_errors=("err", "sum"))
        .reset_index()
    )
    out["failure_micro"] = np.floor(
        out["n_errors"].to_numpy(np.float64)
        / out["n_calls"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_calls": np.int64, "n_errors": np.int64})


def _arg_failure_oracle() -> str:
    from .queries2 import _PARSED_SQL

    return (
        _PARSED_SQL
        + """
SELECT tool_name, call_arg,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(*) FILTER (severity = 'ERROR') AS BIGINT) AS n_errors,
       CAST(floor(CAST(count(*) FILTER (severity = 'ERROR') AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS failure_micro
FROM parsed WHERE tool_name IS NOT NULL
GROUP BY 1, 2"""
    )


ORACLES170["tools_arg_failure"] = _arg_failure_oracle()


# ---------------------------------------------------------------------------
# orders_calendar_gaps — ingest-continuity audit over order dates
# ---------------------------------------------------------------------------


def q_orders_calendar_gaps(sf_dir: str):
    """One row: active order days, the min..max calendar span in days,
    missing days inside the span, and the longest run of consecutive missing
    days — the continuity audit before trusting time-series ops.

    Scale shape: per-batch distinct-day partials fold to the bounded day
    grid on the driver; gap math is a diff over the sorted grid."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("i8")
            // _DAY_US
        )
        return pd.DataFrame({"day": np.unique(day)}).astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "n_active_days": pd.Series([], dtype=np.int64),
            "span_days": pd.Series([], dtype=np.int64),
            "n_missing_days": pd.Series([], dtype=np.int64),
            "longest_gap": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    days = np.unique(part["day"].to_numpy(np.int64))
    span = int(days[-1] - days[0]) + 1
    missing = span - len(days)
    gaps = np.diff(days) - 1
    longest = int(gaps.max()) if len(gaps) else 0
    return pd.DataFrame(
        {
            "n_active_days": [np.int64(len(days))],
            "span_days": [np.int64(span)],
            "n_missing_days": [np.int64(missing)],
            "longest_gap": [np.int64(longest)],
        }
    )


ORACLES170["orders_calendar_gaps"] = f"""
WITH d AS (
  SELECT DISTINCT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_DAY_US} AS day
  FROM orders
),
g AS (
  SELECT day, day - lag(day) OVER (ORDER BY day) - 1 AS gap FROM d
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_active_days,
       CAST((SELECT max(day) - min(day) + 1 FROM d) AS BIGINT) AS span_days,
       CAST((SELECT max(day) - min(day) + 1 - count(*) FROM d) AS BIGINT)
         AS n_missing_days,
       CAST(coalesce((SELECT max(gap) FROM g WHERE gap IS NOT NULL), 0)
            AS BIGINT) AS longest_gap"""


QUERIES170 = {
    "tools_arg_failure": q_tools_arg_failure,
    "orders_calendar_gaps": q_orders_calendar_gaps,
}
