"""Driver-contract queries, wave 345 — the recency churn curve (return
probability after the midpoint as a function of pre-midpoint recency)
and outlier-ownership concentration (are extreme-value events produced
by a few users?). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES345: dict[str, str] = {}

_DAY_US = 86_400_000_000
_RC_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_recency_churn_curve — return rate by pre-midpoint recency
# ---------------------------------------------------------------------------


def q_users_recency_churn_curve(sf_dir: str):
    """Recency curve: split at the midpoint timestamp; per user active
    BEFORE it, recency = midpoint day - last pre-mid event day, bucketed
    0-1 / 2-3 / 4-7 / 8+ days; returned = any post-mid event. Pure
    integer counting. Per bucket: recency_bucket, n_users, n_returned,
    rate_micro."""

    meta = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "mn": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().min()
                    )],
                    "mx": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().max()
                    )],
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["recency_bucket", "n_users", "n_returned", "rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if meta.empty:
        return empty
    mid = (int(meta["mn"].min()) + int(meta["mx"].max())) // 2
    mid_day = mid // _DAY_US

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pre = us < mid
        df = pd.DataFrame(
            {
                "u": u,
                "last_pre": np.where(pre, us // _DAY_US, -1),
                "post": (~pre).astype(np.int64),
            }
        )
        g = df.groupby("u", as_index=False).agg(
            last_pre=("last_pre", "max"), post=("post", "max")
        )
        g["_b"] = (g["u"].to_numpy(np.int64) % _RC_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u").agg(
            last_pre=("last_pre", "max"), post=("post", "max")
        )
        per = per[per["last_pre"] >= 0]
        if len(per) == 0:
            return pd.DataFrame(
                {"b": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "r": pd.Series([], dtype=np.int64)}
            )
        rec = mid_day - per["last_pre"].to_numpy(np.int64)
        b = np.where(
            rec <= 1, 0, np.where(rec <= 3, 1, np.where(rec <= 7, 2, 3))
        ).astype(np.int64)
        df = pd.DataFrame(
            {"b": b, "n": 1, "r": per["post"].to_numpy(np.int64)}
        )
        return df.groupby("b", as_index=False).sum().astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("b")[["n", "r"]]
        .sum()
        .sort_index()
    )
    if h.empty:
        return empty
    out = h.reset_index().rename(
        columns={"b": "recency_bucket", "n": "n_users", "r": "n_returned"}
    )
    out["rate_micro"] = np.floor(
        out["n_returned"].to_numpy(np.float64)
        / out["n_users"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES345["users_recency_churn_curve"] = f"""
WITH span AS (
  SELECT (CAST(min(epoch_us(ts)) AS BIGINT)
          + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS mid
  FROM events
),
per AS (
  SELECT user_id,
         max(CASE WHEN epoch_us(ts) < span.mid
                  THEN epoch_us(ts) // {_DAY_US} END) AS last_pre,
         CAST(max(CASE WHEN epoch_us(ts) >= span.mid THEN 1 ELSE 0 END)
              AS BIGINT) AS post
  FROM events, span GROUP BY 1
),
rec AS (
  SELECT (SELECT mid FROM span) // {_DAY_US} - last_pre AS r, post
  FROM per WHERE last_pre IS NOT NULL
),
b AS (
  SELECT CASE WHEN r <= 1 THEN 0 WHEN r <= 3 THEN 1
              WHEN r <= 7 THEN 2 ELSE 3 END AS recency_bucket, post
  FROM rec
),
agg AS (
  SELECT CAST(recency_bucket AS BIGINT) AS recency_bucket,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(post) AS BIGINT) AS n_returned
  FROM b GROUP BY 1
)
SELECT recency_bucket, n_users, n_returned,
       CAST(floor(CAST(n_returned AS DOUBLE) / CAST(n_users AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
FROM agg
ORDER BY recency_bucket"""


# ---------------------------------------------------------------------------
# events_outlier_user_concentration — who owns the extreme values
# ---------------------------------------------------------------------------


def q_events_outlier_user_concentration(sf_dir: str):
    """Outlier ownership: events with value cents ABOVE the exact P99
    order statistic (k = ceil(0.99 n)); the per-user ownership HHI of
    those outliers vs the HHI of all events — concentrated outliers
    mean a few accounts drive the tail. Pure integer counting, two
    divisions. One row: n_outliers, n_users_with, hhi_outlier_micro,
    hhi_all_micro."""

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n_outliers", "n_users_with", "hhi_outlier_micro",
            "hhi_all_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    k = (99 * n + 99) // 100
    thr = int(hist.index.to_numpy(np.int64)[
        int(np.searchsorted(cum, k, side="left"))
    ])

    def user_partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"u": u, "n": 1, "o": (cents > thr).astype(np.int64)}
        )
        g = df.groupby("u", as_index=False).sum()
        g["_b"] = (g["u"].to_numpy(np.int64) % _RC_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")[["n", "o"]].sum()
        no = per["o"].to_numpy(np.int64).astype(object)
        na = per["n"].to_numpy(np.int64).astype(object)
        return pd.DataFrame(
            {
                "so": [np.int64(int(no.sum()))],
                "so2": [np.int64(int((no * no).sum()))],
                "uo": [np.int64(int((per["o"] > 0).sum()))],
                "sa": [np.int64(int(na.sum()))],
                "sa2": [np.int64(int((na * na).sum()))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        )
        .map_batches(user_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    so, so2, uo = int(p["so"]), int(p["so2"]), int(p["uo"])
    sa, sa2 = int(p["sa"]), int(p["sa2"])
    if so == 0 or sa == 0:
        return empty
    hhi_o = float(so2) / (float(so) * float(so))
    hhi_a = float(sa2) / (float(sa) * float(sa))
    return pd.DataFrame(
        [
            (
                np.int64(so), np.int64(uo),
                np.int64(np.floor(hhi_o * 1_000_000.0 + 0.5)),
                np.int64(np.floor(hhi_a * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES345["events_outlier_user_concentration"] = """
WITH b AS (
  SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
h AS (SELECT cents, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
thr AS (
  SELECT min(cents) AS t FROM (
    SELECT cents, sum(c) OVER (ORDER BY cents) AS cum FROM h
  ), nn WHERE cum * 100 >= 99 * nn.n + 99 - ((99 * nn.n + 99) % 100)
),
per AS (
  SELECT b.user_id,
         CAST(count(*) AS BIGINT) AS na,
         CAST(sum(CASE WHEN b.cents > thr.t THEN 1 ELSE 0 END) AS BIGINT)
           AS no
  FROM b, thr GROUP BY 1
),
agg AS (
  SELECT CAST(sum(no) AS BIGINT) AS so,
         CAST(sum(CAST(no AS HUGEINT) * no) AS HUGEINT) AS so2,
         CAST(sum(CASE WHEN no > 0 THEN 1 ELSE 0 END) AS BIGINT) AS uo,
         CAST(sum(na) AS BIGINT) AS sa,
         CAST(sum(CAST(na AS HUGEINT) * na) AS HUGEINT) AS sa2
  FROM per
)
SELECT so AS n_outliers, uo AS n_users_with,
       CAST(floor(CAST(so2 AS DOUBLE)
                  / (CAST(so AS DOUBLE) * CAST(so AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS hhi_outlier_micro,
       CAST(floor(CAST(sa2 AS DOUBLE)
                  / (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS hhi_all_micro
FROM agg
WHERE so > 0 AND sa > 0"""


QUERIES345 = {
    "users_recency_churn_curve": q_users_recency_churn_curve,
    "events_outlier_user_concentration": q_events_outlier_user_concentration,
}
