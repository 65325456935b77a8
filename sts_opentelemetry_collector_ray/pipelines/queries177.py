"""Driver-contract queries, wave 177 — first-error depth (at which turn a
conversation FIRST goes ERROR — early failures are setup bugs, late ones are
fatigue) and weekday × priority order mix (operational seasonality of the
priority queue). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES177: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# conv_first_error_depth — first ERROR turn per conversation, histogram
# ---------------------------------------------------------------------------


def q_conv_first_error_depth(sf_dir: str):
    """Histogram over the FIRST ERROR-severity turn index per conversation
    (conversations that never error are absent): conversation counts per
    depth.

    Scale shape: parsed ERROR turns ride ONE conv-bucket exchange;
    per-bucket (conv → min turn) via lexsort + drop_duplicates; bounded
    (depth, n) histogram partials fold on the driver."""
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        sev = np.asarray(t["severity"].to_numpy(zero_copy_only=False))
        keep = sev == "ERROR"
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))[keep]
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)[keep],
            }
        )
        df["_b"] = (fnv1a64_array(conv.astype(object)) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "first_error_turn": pd.Series([], dtype=np.int64),
                "n_convs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        first = (
            g.sort_values(["conv", "turn"], kind="mergesort")
            .drop_duplicates("conv")
        )
        return (
            first.groupby("turn", sort=False)
            .size()
            .reset_index(name="n_convs")
            .rename(columns={"turn": "first_error_turn"})
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
            "first_error_turn": pd.Series([], dtype=np.int64),
            "n_convs": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "first_error_turn" not in part.columns:
        return empty
    return (
        part.groupby("first_error_turn", sort=True)["n_convs"]
        .sum()
        .reset_index()
        .astype(np.int64)
    )


def _first_error_oracle() -> str:
    from .queries2 import _PARSED_SQL

    return (
        _PARSED_SQL
        + """,
f AS (
  SELECT conv_id, min(turn_idx) AS t FROM parsed
  WHERE severity = 'ERROR' GROUP BY 1
)
SELECT CAST(t AS BIGINT) AS first_error_turn,
       CAST(count(*) AS BIGINT) AS n_convs
FROM f GROUP BY 1"""
    )


ORACLES177["conv_first_error_depth"] = _first_error_oracle()


# ---------------------------------------------------------------------------
# orders_dow_priority_mix — priority mix by weekday
# ---------------------------------------------------------------------------


def q_orders_dow_priority_mix(sf_dir: str):
    """Per (epoch-day mod 7, priority): order count and the priority's share
    WITHIN the weekday in micro units (dow 0 ≡ Thursday, the 1970-01-01
    anchor used across this repo's weekday ops).

    Scale shape: per-batch bounded (dow, priority) combiner; driver fold."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderpriority"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        dow = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("i8")
            // _DAY_US
        ) % 7
        g = (
            pd.DataFrame(
                {
                    "dow": dow,
                    "o_orderpriority": np.asarray(
                        t["o_orderpriority"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                }
            )
            .groupby(["dow", "o_orderpriority"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"dow": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "dow": pd.Series([], dtype=np.int64),
            "o_orderpriority": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype=np.int64),
            "in_dow_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["dow", "o_orderpriority"], sort=True)["n"]
        .sum()
        .reset_index(name="n_orders")
    )
    dtot = out.groupby("dow")["n_orders"].transform("sum")
    out["in_dow_micro"] = np.floor(
        out["n_orders"].to_numpy(np.float64)
        / dtot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"dow": np.int64, "n_orders": np.int64})


ORACLES177["orders_dow_priority_mix"] = f"""
WITH g AS (
  SELECT (epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_DAY_US}) % 7 AS dow,
         o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
),
dt AS (SELECT dow, CAST(sum(n_orders) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT CAST(g.dow AS BIGINT) AS dow, g.o_orderpriority, g.n_orders,
       CAST(floor(CAST(g.n_orders AS DOUBLE) / CAST(dt.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_dow_micro
FROM g JOIN dt USING (dow)"""


QUERIES177 = {
    "conv_first_error_depth": q_conv_first_error_depth,
    "orders_dow_priority_mix": q_orders_dow_priority_mix,
}
