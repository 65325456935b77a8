"""Driver-contract queries, wave 82 — per-user activity streaks (the
gaps-and-islands readout behind engagement scoring: longest consecutive-day
run, streak count) and perfect-order rate (relational division: ALL items of
an order shipped within the SLA, rolled up by order month). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES82: dict[str, str] = {}

_STREAK_BUCKETS = 64
_PERFECT_DAYS = 30
_PERFECT_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_streaks — longest consecutive-day streak per user
# ---------------------------------------------------------------------------


def q_events_streaks(sf_dir: str):
    """Engagement streaks: per user, the count of distinct active days, the
    number of maximal consecutive-day runs, and the longest run.

    Scale shape: per-batch (user, day) distinct partials share ONE
    user-bucket exchange; the per-bucket kernel re-uniques, lexsorts once,
    and derives runs from vectorized day diffs at segment boundaries —
    buckets own users completely and emit final rows."""

    def rows(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        g = pd.DataFrame({"u": u, "d": d}).drop_duplicates()
        return pd.DataFrame(
            {
                "u": g["u"].to_numpy(np.int64),
                "d": g["d"].to_numpy(np.int64),
                "_b": (g["u"].to_numpy(np.int64) % _STREAK_BUCKETS).astype(
                    np.int64
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g[["u", "d"]].drop_duplicates()
        u = gg["u"].to_numpy(np.int64)
        d = gg["d"].to_numpy(np.int64)
        o = np.lexsort((d, u))
        u, d = u[o], d[o]
        new_run = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        run_id = np.cumsum(new_run) - 1
        # run lengths, then per-user aggregates over runs
        run_len = np.bincount(run_id)
        run_user = u[new_run]
        df = pd.DataFrame({"u": run_user, "len": run_len})
        agg = df.groupby("u", sort=False).agg(
            n_streaks=("len", "size"), longest_streak=("len", "max"),
            n_active_days=("len", "sum"),
        )
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64),
                "n_active_days": agg["n_active_days"].to_numpy(np.int64),
                "n_streaks": agg["n_streaks"].to_numpy(np.int64),
                "longest_streak": agg["longest_streak"].to_numpy(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES82["events_streaks"] = f"""
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
),
runs AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
  FROM i GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# orders_perfect_rate — ALL items within SLA, by order month
# ---------------------------------------------------------------------------


def q_orders_perfect_rate(sf_dir: str):
    """Perfect-order rate: an order is perfect when EVERY lineitem shipped
    within {D} days of the order date (relational division folded to a
    per-order max); per order month, the order count, perfect count and
    exact micro rate. Orders without lineitems are out of scope.

    Scale shape: lineitems pre-reduce per-orderkey max-shipday inside each
    batch and share ONE orderkey-bucket exchange with the orders rows; each
    bucket emits per-month integer partials and the driver re-reduces
    |months| rows.""".format(D=_PERFECT_DAYS)

    def li_partial(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        g = pd.DataFrame({"k": k, "msd": d}).groupby(
            "k", sort=False, as_index=False
        ).max()
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy(np.int64),
                "msd": g["msd"].to_numpy(np.int64),
                "od": np.int64(-1),
                "mon": np.int64(-1),
                "_b": (g["k"].to_numpy(np.int64) % _PERFECT_BUCKETS).astype(
                    np.int64
                ),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        k = t["o_orderkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "msd": np.int64(-1),
                "od": d,
                "mon": y * 100 + m,
                "_b": (k % _PERFECT_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["od"] >= 0).to_numpy()
        ms = (
            g.loc[~is_o, ["k", "msd"]]
            .groupby("k", sort=False, as_index=False)
            .max()
        )
        j = g.loc[is_o, ["k", "od", "mon"]].merge(ms, on="k")
        j["perfect"] = (
            j["msd"].to_numpy() <= j["od"].to_numpy() + _PERFECT_DAYS
        ).astype(np.int64)
        out = j.groupby("mon", sort=False).agg(
            n=("k", "size"), np_=("perfect", "sum")
        )
        return pd.DataFrame(
            {
                "mon": out.index.to_numpy(np.int64),
                "n": out["n"].to_numpy(np.int64),
                "np": out["np_"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |months| rows per bucket
        .groupby("mon", as_index=False)[["n", "np"]]
        .sum()
        .sort_values("mon", kind="mergesort")
    )
    n = part["n"].to_numpy(np.int64)
    npf = part["np"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "order_month": part["mon"].to_numpy(np.int64),
            "n_orders": n,
            "n_perfect": npf,
            "perfect_rate_micro": (npf * 1_000_000) // np.maximum(n, 1),
        }
    )


ORACLES82["orders_perfect_rate"] = f"""
WITH ls AS (
  SELECT l_orderkey AS k, max(epoch_us(l_shipdate) // {_DAY_US}) AS msd
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS order_month,
         CASE WHEN msd <= epoch_us(o_orderdate) // {_DAY_US} + {_PERFECT_DAYS}
              THEN 1 ELSE 0 END AS perfect
  FROM orders JOIN ls ON k = o_orderkey
),
a AS (
  SELECT order_month, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(perfect) AS BIGINT) AS n_perfect
  FROM j GROUP BY 1
)
SELECT order_month, n_orders, n_perfect,
       CAST((CAST(n_perfect AS HUGEINT) * 1000000)
            // CAST(greatest(n_orders, 1) AS HUGEINT) AS BIGINT)
         AS perfect_rate_micro
FROM a ORDER BY order_month"""


QUERIES82 = {
    "events_streaks": q_events_streaks,
    "orders_perfect_rate": q_orders_perfect_rate,
}
