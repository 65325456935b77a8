"""Driver-contract queries, wave 145 — user lifespan histogram (first→last
activity span per user, bucketed into the scale-0 exponential day grid: the
engagement-durability census behind retention planning). The stage-level
wave-145 work is checkpoint/resume for label_propagation_sync
(stages/graph.py, tests/test_graph_checkpoint.py). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES145: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# users_lifespan_histogram — first→last activity span per user, exp buckets
# ---------------------------------------------------------------------------


def q_users_lifespan_histogram(sf_dir: str):
    """Per exponential lifespan bucket: how many users have a first→last
    event span of that many DAYS (span = last_day − first_day in epoch days;
    bucket 0 = single-day users, bucket k > 0 covers spans in
    (2^(k-1), 2^k] i.e. k = bit_length(span) via the exact frexp trick), the
    total events those users produced, and their share of the user base in
    micro units.

    Scale shape: per-batch (user, min_day, max_day, n) combiner, ONE
    user-hash bucket exchange (a user's extremes complete in one bucket),
    per-bucket re-reduce + bucketize to bounded (bucket, n_users, n_events)
    histogram partials folded on the driver."""
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
                    "lo": day,
                    "hi": day,
                    "n": 1,
                }
            )
            .groupby("u", sort=False, as_index=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
        )
        g["_b"] = (g["u"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"lo": np.int64, "hi": np.int64, "n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per_user = g.groupby("u", sort=False, as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
        )
        span = (per_user["hi"] - per_user["lo"]).to_numpy(np.int64)
        _, e = np.frexp(span.astype(np.float64))
        bucket = np.where(span == 0, 0, e).astype(np.int64)
        hist = (
            pd.DataFrame({"bucket": bucket, "n_users": 1, "n_events": per_user["n"]})
            .groupby("bucket", sort=False, as_index=False)
            .sum()
        )
        return hist.astype(np.int64)

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ~40 buckets per exchange bucket
    )
    empty = pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "user_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "bucket" not in part.columns:
        return empty
    out = (
        part.groupby("bucket", sort=True)[["n_users", "n_events"]]
        .sum()
        .reset_index()
    )
    total = float(out["n_users"].sum())
    out["user_share_micro"] = np.floor(
        out["n_users"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES145["users_lifespan_histogram"] = f"""
WITH per_user AS (
  SELECT user_id,
         min(epoch_us(ts) // {_DAY_US}) AS lo,
         max(epoch_us(ts) // {_DAY_US}) AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
b AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE CAST(length(bin(hi - lo)) AS BIGINT) END AS bucket,
         n
  FROM per_user
),
g AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n) AS BIGINT) AS n_events
  FROM b GROUP BY 1
)
SELECT bucket, n_users, n_events,
       CAST(floor(CAST(n_users AS DOUBLE)
                  / CAST((SELECT sum(n_users) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS user_share_micro
FROM g"""


QUERIES145 = {
    "users_lifespan_histogram": q_users_lifespan_histogram,
}
