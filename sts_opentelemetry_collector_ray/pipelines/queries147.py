"""Driver-contract queries, wave 147 — weekly value-quantile drift per event
type (exact p50/p90 per (type, week): the distribution-shift monitor that
catches what mean-based drift misses) and per-user spend quantiles (exact
p50/p90 over per-user lifetime value — the whale-curve summary). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES147: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_quantile_drift — exact weekly p50/p90 per event type
# ---------------------------------------------------------------------------


def q_events_quantile_drift(sf_dir: str):
    """Exact p50/p90 of event value per (event_type, epoch-week) — the
    grouped value-histogram quantile engine keyed by the composite
    'type|week' (bounded grid), split back into typed columns afterwards.
    Rank picks are integer-rational (ceil(n·q)), values exact cents/100.

    Scale shape: the exchange carries the distinct-cents histogram per
    (type, week), never rows (stages/quantiles.py contract)."""
    from ..stages.quantiles import grouped_quantiles_exact

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def project(t: pa.Table) -> pa.Table:
        week = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
            // 7
        )
        key = pc.binary_join_element_wise(
            t["event_type"],
            pa.array(week.astype("U"), pa.string()),
            "|",
        )
        return pa.table({"key": key, "value": t["value"]})

    q = grouped_quantiles_exact(
        ds.map_batches(project, batch_format="pyarrow"), "value", "key"
    )

    def split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["key"].str.rsplit("|", n=1, expand=True)
        out = pd.DataFrame(
            {
                "event_type": parts[0],
                "week": parts[1].astype(np.int64),
                "q_label": df["q_label"],
                "n": df["n"].astype(np.int64),
                "value": df["value"].astype(np.float64),
            }
        )
        return out

    return q.map_batches(split, batch_format="pandas")


ORACLES147["events_quantile_drift"] = f"""
WITH b AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} // 7 AS week,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (
  SELECT event_type, week, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2, 3
),
t AS (
  SELECT event_type, week, CAST(sum(cnt) AS BIGINT) AS n
  FROM c GROUP BY 1, 2
),
cum AS (
  SELECT event_type, week, cents,
         sum(cnt) OVER (PARTITION BY event_type, week ORDER BY cents) AS cum
  FROM c
),
qs AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90')) q(num, den, q_label)),
pick AS (
  SELECT t.event_type, t.week, q.q_label, t.n, min(cum.cents) AS cents
  FROM t CROSS JOIN qs q
  JOIN cum ON cum.event_type = t.event_type AND cum.week = t.week
          AND cum.cum >= (t.n * q.num + q.den - 1) // q.den
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, CAST(week AS BIGINT) AS week, q_label, n,
       cents / 100.0 AS value
FROM pick"""


# ---------------------------------------------------------------------------
# users_spend_quantiles — exact p50/p90 of per-user lifetime value
# ---------------------------------------------------------------------------


def q_users_spend_quantiles(sf_dir: str):
    """Exact p50/p90 over each user's LIFETIME value total (exact cents):
    first a per-user total (ONE user-bucket exchange), then the grouped
    value-histogram quantile pick over the distinct-total histogram — the
    whale-curve summary without a global sort.

    Scale shape: per-batch (user, cents) combiner, user-bucket exchange
    completes totals, per-bucket (cents → count) histogram partials fold on
    the driver (bounded by distinct total values per bucket), integer-
    rational rank pick."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "u": t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "cents": cents,
                }
            )
            .groupby("u", sort=False, as_index=False)["cents"]
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("u", sort=False, as_index=False)["cents"].sum()
        hist = (
            tot.groupby("cents", sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return hist.astype({"cents": np.int64, "cnt": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: distinct per-user totals per bucket
    )
    empty = pd.DataFrame(
        {
            "q_label": pd.Series([], dtype=object),
            "n_users": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64),
        }
    )
    if part.empty or "cents" not in part.columns:
        return empty
    hist = part.groupby("cents", sort=True)["cnt"].sum().reset_index()
    cents = hist["cents"].to_numpy(np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n = int(cum[-1])
    rows = []
    for num, den, label in ((1, 2, "p50"), (9, 10, "p90")):
        rank = (n * num + den - 1) // den
        i = int(np.searchsorted(cum, rank, side="left"))
        rows.append((label, n, cents[i] / 100.0))
    return pd.DataFrame(rows, columns=["q_label", "n_users", "value"]).astype(
        {"n_users": np.int64, "value": np.float64}
    )


ORACLES147["users_spend_quantiles"] = """
WITH tot AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1
),
c AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM tot GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
cum AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM c),
qs AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90')) q(num, den, q_label)),
pick AS (
  SELECT q.q_label, t.n, min(cum.cents) AS cents
  FROM t CROSS JOIN qs q
  JOIN cum ON cum.cum >= (t.n * q.num + q.den - 1) // q.den
  GROUP BY 1, 2
)
SELECT q_label, n AS n_users, cents / 100.0 AS value FROM pick"""


QUERIES147 = {
    "events_quantile_drift": q_events_quantile_drift,
    "users_spend_quantiles": q_users_spend_quantiles,
}
