"""Driver-contract queries, wave 151 — exact Pareto concentration without a
global sort: the share of total activity owned by the top-1% entities, for
users (by event count) and orders (by value). The p99 cutoff comes from the
distinct-total histogram (integer-rational rank pick, the quantile-engine
contract), and ties at the cutoff are INCLUDED — deterministic on both
engines. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES151: dict[str, str] = {}


def _pareto_from_histogram(hist: pd.DataFrame, val_col: str, cnt_col: str):
    """(n_entities, cutoff, top_n, top_mass, total_mass) from a sorted
    distinct-value histogram — rank = ceil(0.99·n), entities ≥ value-at-rank
    count as top (ties included)."""
    h = hist.sort_values(val_col).reset_index(drop=True)
    vals = h[val_col].to_numpy(np.int64)
    cnts = h[cnt_col].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    rank = (n * 99 + 99) // 100  # ceil(n·99/100)
    i = int(np.searchsorted(cum, rank, side="left"))
    cutoff = int(vals[i])
    top_mask = vals >= cutoff
    top_n = int(cnts[top_mask].sum())
    top_mass = int((vals[top_mask] * cnts[top_mask]).sum())
    total_mass = int((vals * cnts).sum())
    return n, cutoff, top_n, top_mass, total_mass


# ---------------------------------------------------------------------------
# users_top1pct_share — share of all events from the top-1% heaviest users
# ---------------------------------------------------------------------------


def q_users_top1pct_share(sf_dir: str):
    """One row: user count, the p99 event-count cutoff, how many users meet
    it (ties included), and the share of ALL events those users produced in
    micro units.

    Scale shape: per-batch (user, n) combiner, ONE user-bucket exchange
    completes totals, per-bucket (total → user count) histogram partials
    fold on the driver — the exchange carries distinct totals, never rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "u": t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "n": 1,
                }
            )
            .groupby("u", sort=False, as_index=False)["n"]
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("u", sort=False, as_index=False)["n"].sum()
        return (
            tot.groupby("n", sort=False)
            .size()
            .reset_index(name="cnt")
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
            "n_users": pd.Series([], dtype=np.int64),
            "cutoff_events": pd.Series([], dtype=np.int64),
            "top_users": pd.Series([], dtype=np.int64),
            "top_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "n" not in part.columns:
        return empty
    hist = part.groupby("n", sort=True)["cnt"].sum().reset_index()
    n, cutoff, top_n, top_mass, total = _pareto_from_histogram(hist, "n", "cnt")
    share = int(np.floor(top_mass / float(total) * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        {
            "n_users": [np.int64(n)],
            "cutoff_events": [np.int64(cutoff)],
            "top_users": [np.int64(top_n)],
            "top_share_micro": [np.int64(share)],
        }
    )


ORACLES151["users_top1pct_share"] = """
WITH tot AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
h AS (SELECT n, CAST(count(*) AS BIGINT) AS cnt FROM tot GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS users FROM h),
cum AS (SELECT n, sum(cnt) OVER (ORDER BY n) AS cum FROM h),
cut AS (
  SELECT min(cum.n) AS cutoff FROM t
  JOIN cum ON cum.cum >= (t.users * 99 + 99) // 100
),
top AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS top_users,
         CAST(sum(n * cnt) AS BIGINT) AS top_mass
  FROM h CROSS JOIN cut WHERE h.n >= cut.cutoff
)
SELECT t.users AS n_users,
       CAST(cut.cutoff AS BIGINT) AS cutoff_events,
       top.top_users,
       CAST(floor(CAST(top.top_mass AS DOUBLE)
                  / CAST((SELECT sum(n * cnt) FROM h) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS top_share_micro
FROM t CROSS JOIN cut CROSS JOIN top"""


# ---------------------------------------------------------------------------
# orders_top1pct_share — revenue share of the top-1% most valuable orders
# ---------------------------------------------------------------------------


def q_orders_top1pct_share(sf_dir: str):
    """One row: order count, the p99 order-value cutoff in cents, orders at
    or above it (ties included), and their share of total order value in
    micro units.

    Scale shape: per-batch (cents → count) histogram combiner — orders carry
    their value in one row, so no exchange at all — folded on the driver
    over distinct cent values."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({"cents": cents, "cnt": 1})
            .groupby("cents", sort=False, as_index=False)["cnt"]
            .sum()
            .astype(np.int64)
        )

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "n_orders": pd.Series([], dtype=np.int64),
            "cutoff_cents": pd.Series([], dtype=np.int64),
            "top_orders": pd.Series([], dtype=np.int64),
            "top_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    hist = part.groupby("cents", sort=True)["cnt"].sum().reset_index()
    n, cutoff, top_n, top_mass, total = _pareto_from_histogram(
        hist, "cents", "cnt"
    )
    share = int(np.floor(top_mass / float(total) * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        {
            "n_orders": [np.int64(n)],
            "cutoff_cents": [np.int64(cutoff)],
            "top_orders": [np.int64(top_n)],
            "top_share_micro": [np.int64(share)],
        }
    )


ORACLES151["orders_top1pct_share"] = """
WITH tot AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
h AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM tot GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS orders FROM h),
cum AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM h),
cut AS (
  SELECT min(cum.cents) AS cutoff FROM t
  JOIN cum ON cum.cum >= (t.orders * 99 + 99) // 100
),
top AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS top_orders,
         CAST(sum(cents * cnt) AS BIGINT) AS top_mass
  FROM h CROSS JOIN cut WHERE h.cents >= cut.cutoff
)
SELECT t.orders AS n_orders,
       CAST(cut.cutoff AS BIGINT) AS cutoff_cents,
       top.top_orders,
       CAST(floor(CAST(top.top_mass AS DOUBLE)
                  / CAST((SELECT sum(cents * cnt) FROM h) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS top_share_micro
FROM t CROSS JOIN cut CROSS JOIN top"""


QUERIES151 = {
    "users_top1pct_share": q_users_top1pct_share,
    "orders_top1pct_share": q_orders_top1pct_share,
}
