"""Driver-contract queries, wave 157 — first-order premium (do customers
spend more or less on their first order than on repeats? exact cents over
order sequences) and tool-switch cost (is the gap to the next tool call
longer when the tool CHANGES — the context-switch tax over transcripts).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES157: dict[str, str] = {}


# ---------------------------------------------------------------------------
# customers_first_order_premium — first vs repeat order value
# ---------------------------------------------------------------------------


def q_customers_first_order_premium(sf_dir: str):
    """Over customers with >= 2 orders: exact summed first-order cents vs
    repeat-order cents (first = smallest (o_orderdate, o_orderkey) — the
    deterministic tiebreak), average each in micro-cents, and the premium
    ratio avg_first/avg_rest in micro units. ONE double division per output
    column.

    Scale shape: per-batch (cust, min-key, sums) combiner can't resolve the
    first order locally, so raw (cust, date, key, cents) rows take ONE
    customer-bucket exchange; per-bucket lexsort + boundary scan split
    first/rest and emit three scalars per bucket; the driver folds 64
    rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "c": t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "d": t["o_orderdate"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .view("i8"),
                "k": t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "cents": cents,
            }
        )
        df["_b"] = (df["c"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_cust": pd.Series([], dtype=np.int64),
                "first_cents": pd.Series([], dtype=np.int64),
                "rest_cents": pd.Series([], dtype=np.int64),
                "rest_orders": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["c", "d", "k"], kind="mergesort")
        c = g["c"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        new = np.r_[True, c[1:] != c[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(g)])
        multi = counts >= 2
        if not multi.any():
            return empty
        first_cents = cents[starts[multi]]
        total = np.add.reduceat(cents, starts)[multi]
        rest_cents = total - first_cents
        return pd.DataFrame(
            {
                "n_cust": [np.int64(multi.sum())],
                "first_cents": [np.int64(first_cents.sum())],
                "rest_cents": [np.int64(rest_cents.sum())],
                "rest_orders": [np.int64((counts[multi] - 1).sum())],
            }
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: one scalar row per bucket
    )
    empty = pd.DataFrame(
        {
            "n_customers": pd.Series([], dtype=np.int64),
            "avg_first_micro": pd.Series([], dtype=np.int64),
            "avg_rest_micro": pd.Series([], dtype=np.int64),
            "premium_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "n_cust" not in part.columns:
        return empty
    n = int(part["n_cust"].sum())
    if n == 0:
        return empty
    fc = int(part["first_cents"].sum())
    rc = int(part["rest_cents"].sum())
    ro = int(part["rest_orders"].sum())
    avg_first = np.floor(fc / float(n) * 1_000_000.0 + 0.5)
    avg_rest = np.floor(rc / float(ro) * 1_000_000.0 + 0.5)
    premium = np.floor(
        (fc * ro) / float(rc * n) * 1_000_000.0 + 0.5
    )  # integer products first
    return pd.DataFrame(
        {
            "n_customers": [np.int64(n)],
            "avg_first_micro": [np.int64(avg_first)],
            "avg_rest_micro": [np.int64(avg_rest)],
            "premium_micro": [np.int64(premium)],
        }
    )


ORACLES157["customers_first_order_premium"] = """
WITH o AS (
  SELECT o_custkey AS c,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS cnt
  FROM orders
),
m AS (SELECT * FROM o WHERE cnt >= 2),
s AS (
  SELECT CAST(count(DISTINCT c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT) AS fc,
         CAST(sum(CASE WHEN rn > 1 THEN cents ELSE 0 END) AS BIGINT) AS rc,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS ro
  FROM m
)
SELECT n AS n_customers,
       CAST(floor(CAST(fc AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS avg_first_micro,
       CAST(floor(CAST(rc AS DOUBLE) / CAST(ro AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS avg_rest_micro,
       CAST(floor(CAST(fc * ro AS DOUBLE) / CAST(rc * n AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS premium_micro
FROM s WHERE n > 0"""


# ---------------------------------------------------------------------------
# tools_switch_cost — gap to next tool call, same tool vs switched
# ---------------------------------------------------------------------------


def q_tools_switch_cost(sf_dir: str):
    """Over consecutive tool-bearing turns within a conversation: the
    wall-clock gap in exact µs, split by whether the tool CHANGED — two rows
    ('same', 'switch') with pair counts, summed µs, and average micro-µs.

    Scale shape: tool-bearing turns ride ONE conv-bucket exchange;
    per-bucket lexsort + shifted compares emit two scalar rows per bucket;
    the driver folds 128 rows."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("tool",))
        df["ts_us"] = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
        )
        return df[df["tool"] != ""]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "transition": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "us": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        tool = g["tool"].to_numpy(object)
        ts = g["ts_us"].to_numpy(np.int64)
        same_conv = conv[1:] == conv[:-1]
        if not same_conv.any():
            return empty
        gap = (ts[1:] - ts[:-1])[same_conv]
        switched = (tool[1:] != tool[:-1])[same_conv]
        lab = np.where(switched, "switch", "same")
        return (
            pd.DataFrame({"transition": lab, "n": 1, "us": gap})
            .groupby("transition", sort=False, as_index=False)
            .sum()
            .astype({"n": np.int64, "us": np.int64})
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "transition": pd.Series([], dtype=object),
            "n_pairs": pd.Series([], dtype=np.int64),
            "sum_us": pd.Series([], dtype=np.int64),
            "avg_us_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "transition" not in part.columns:
        return empty
    out = (
        part.groupby("transition", sort=True)
        .agg(n_pairs=("n", "sum"), sum_us=("us", "sum"))
        .reset_index()
    )
    out["avg_us_micro"] = np.floor(
        out["sum_us"].to_numpy(np.float64)
        / out["n_pairs"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_pairs": np.int64, "sum_us": np.int64})


def _switch_cost_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
tl AS (
  SELECT conv_id, turn_idx, tool, epoch_us(ts) AS us
  FROM transcripts WHERE tool <> ''
),
p AS (
  SELECT conv_id, tool,
         lag(tool) OVER w AS prev_tool,
         us - lag(us) OVER w AS gap
  FROM tl WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
g AS (
  SELECT CASE WHEN tool = prev_tool THEN 'same' ELSE 'switch' END
           AS transition,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(gap) AS BIGINT) AS sum_us
  FROM p WHERE prev_tool IS NOT NULL
  GROUP BY 1
)
SELECT transition, n_pairs, sum_us,
       CAST(floor(CAST(sum_us AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_us_micro
FROM g"""
    )


ORACLES157["tools_switch_cost"] = _switch_cost_oracle()


QUERIES157 = {
    "customers_first_order_premium": q_customers_first_order_premium,
    "tools_switch_cost": q_tools_switch_cost,
}
