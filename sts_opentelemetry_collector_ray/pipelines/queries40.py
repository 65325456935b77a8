"""Driver-contract queries, wave 40 — PromQL-style counter increase/rate with
reset handling (the telemetry rate() semantics over a per-series ordered scan)
and the 2-D skyline / Pareto frontier (the classic non-dominated-points
operator). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES40: dict[str, str] = {}

_RATE_USER_BUCKETS = 32


# ---------------------------------------------------------------------------
# events_counter_rate — PromQL increase()/rate() with counter resets
# ---------------------------------------------------------------------------


def q_events_counter_rate(sf_dir: str):
    """Counter increase/rate (the PromQL rate() contract, promql/functions.go
    extrapolatedRate's reset rule): scanning each (event_type, user_id) series
    in (ts, event_id) order, a drop in the counter is a RESET — the new value
    counts fully; otherwise the delta counts. increase = Σ those terms over
    consecutive pairs; rate = increase / time-span.

    ONE bounded user-bucket exchange; per bucket a single lexsort + shift
    masks (the interarrival idiom with the reset branch). increase stays in
    exact integer cents; the per-second rate is the only float, derived with
    the identical expression order on both sides and micro-floored."""

    def prep(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": pa.array(uid),
                "event_id": t["event_id"],
                "tu": pa.array(t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)),
                "cents": pa.array(
                    np.floor(
                        t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
                "_b": pa.array((uid % _RATE_USER_BUCKETS).astype(np.int32)),
            }
        )

    def rate(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(
            ["event_type", "user_id", "tu", "event_id"], kind="mergesort"
        )
        et = d["event_type"].to_numpy(dtype=object)
        uid = d["user_id"].to_numpy()
        tu = d["tu"].to_numpy()
        c = d["cents"].to_numpy()
        new_series = np.concatenate(
            [[True], (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])]
        )
        starts = np.flatnonzero(new_series)
        prev_c = np.empty_like(c)
        prev_c[1:] = c[:-1]
        # per-pair increase: reset (drop) counts the new value fully
        term = np.where(c >= prev_c, c - prev_c, c)
        term[starts] = 0  # first sample of a series opens no pair
        inc = np.add.reduceat(term, starts)
        n = np.diff(np.concatenate([starts, [len(d)]]))
        span = tu[np.concatenate([starts[1:] - 1, [len(d) - 1]])] - tu[starts]
        with np.errstate(divide="ignore", invalid="ignore"):
            rate_f = (inc.astype(np.float64) / 100.0) / (
                span.astype(np.float64) / 1000000.0
            )
        # float64 with NaN for span=0 — DuckDB's NULL-bearing BIGINT column
        # round-trips to float64/NaN in pandas, the interarrival convention
        rate_micro = np.where(span > 0, np.floor(rate_f * 1e6 + 0.5), np.nan)
        return pd.DataFrame(
            {
                "event_type": et[starts],
                "user_id": uid[starts].astype(np.int64),
                "n": n.astype(np.int64),
                "increase_cents": inc.astype(np.int64),
                "span_us": span.astype(np.int64),
                "rate_micro": rate_micro.astype(np.float64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(lambda g: rate(g.drop(columns=["_b"])), batch_format="pandas")
    )


ORACLES40["events_counter_rate"] = """
WITH s AS (
  SELECT event_type, user_id, epoch_us(ts) AS tu,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id) AS pc
  FROM events
),
agg AS (
  SELECT event_type, user_id, count(*) AS n,
         CAST(SUM(CASE WHEN pc IS NULL THEN 0
                       WHEN cents >= pc THEN cents - pc
                       ELSE cents END) AS BIGINT) AS increase_cents,
         max(tu) - min(tu) AS span_us
  FROM s GROUP BY 1, 2
)
SELECT event_type, user_id, n, increase_cents, CAST(span_us AS BIGINT) AS span_us,
       CASE WHEN span_us > 0
            THEN CAST(floor((increase_cents / 100.0) / (span_us / 1000000.0)
                            * 1000000 + 0.5) AS DOUBLE)
            ELSE NULL END AS rate_micro
FROM agg"""


# ---------------------------------------------------------------------------
# orders_skyline — 2-D Pareto frontier (non-dominated orders)
# ---------------------------------------------------------------------------


def q_orders_skyline(sf_dir: str):
    """Skyline / Pareto frontier (Börzsönyi et al. 2001): the orders not
    dominated on (totalprice ↑, orderdate ↑) — another order dominates if it
    is ≥ on both and > on at least one.

    The distributive property that scales: skyline(⋃ partials) =
    skyline(⋃ skyline(partial)) — each block emits its LOCAL skyline (a sort +
    per-price-group max + exclusive running max, fully vectorized) and the
    driver merges the bounded union (2-D random-data skylines are ~log n
    points). Exact integer cents; duplicates of a frontier point all survive
    (no strict improvement)."""

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        if "price_cents" in df.columns:
            cents = df["price_cents"].to_numpy().astype(np.int64)
        else:
            cents = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
                np.int64
            )
        dt = df["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        key = df["o_orderkey"].to_numpy()
        order = np.lexsort((-dt, -cents))  # price desc, date desc
        cs, ds_, ks = cents[order], dt[order], key[order]
        # group max date per equal-price run
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        grp = np.cumsum(np.concatenate([[0], (cs[1:] != cs[:-1]).astype(int)]))
        grp_max = np.maximum.reduceat(ds_, starts)
        # exclusive running max of date over strictly-higher-price groups
        prev_max = np.concatenate(
            [[np.iinfo(np.int64).min], np.maximum.accumulate(grp_max)[:-1]]
        )
        keep = (ds_ > prev_max[grp]) & (ds_ == grp_max[grp])
        return pd.DataFrame(
            {
                "o_orderkey": ks[keep].astype(np.int64),
                "price_cents": cs[keep],
                "o_orderdate": pd.to_datetime(ds_[keep], unit="us").astype(
                    "datetime64[us]"
                ),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(local_skyline, batch_format="pandas")
        .to_pandas()  # bounded: local skylines are ~log(block) points
    )
    final = local_skyline(parts)
    return (
        final[["o_orderkey", "price_cents", "o_orderdate"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
        .astype({"price_cents": np.int64})
    )


ORACLES40["orders_skyline"] = """
WITH o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p,
         o_orderdate AS d
  FROM orders
)
SELECT a.o_orderkey, a.p AS price_cents, a.d AS o_orderdate
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.p >= a.p AND b.d >= a.d AND (b.p > a.p OR b.d > a.d)
)"""


QUERIES40 = {
    "events_counter_rate": q_events_counter_rate,
    "orders_skyline": q_orders_skyline,
}
