"""Driver-contract queries, wave 248 — a ClickHouse-style windowFunnel
(max ordered view→click→purchase depth within 72 h of the chain's first
step; the reference exports to ClickHouse, whose funnel the analysts run)
and a 7-day rolling distinct-user count per day with the new-user share.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES248: dict[str, str] = {}

_WF_STEPS = ("view", "click", "purchase")
_WF_WINDOW_US = 72 * 3600 * 1_000_000  # 72 h in microseconds
_RD_WINDOW = 7  # days


# ---------------------------------------------------------------------------
# events_window_funnel — max ordered depth within the 72 h window
# ---------------------------------------------------------------------------


def q_events_window_funnel(sf_dir: str):
    """windowFunnel('view','click','purchase', 72 h): per user the max
    level L such that some view v is followed by a click c and then a
    purchase p with v.ts < c.ts ≤ v.ts+W and c.ts < p.ts ≤ v.ts+W (strict
    order, window anchored at the view). Output: level, n_users (users
    whose max level ≥ that level).

    Scale shape: per-type timestamp sets fold per user inside ONE
    user-bucket exchange; the per-user chain scan is a searchsorted over
    that user's own events."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id", "event_type"]).to_pandas()
        df["ts_us"] = pd.Series(
            t["ts"].to_numpy(zero_copy_only=False)
        ).astype("datetime64[us]").astype(np.int64)
        df = df[df["event_type"].isin(_WF_STEPS)]
        return df[["user_id", "event_type", "ts_us"]]

    per = (
        ray.data.read_parquet(path, columns=["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["level", "n_users"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if per.empty:
        return empty
    levels = np.zeros(0, dtype=np.int64)
    lv = []
    for _, sub in per.groupby("user_id", sort=False):
        views = np.sort(
            sub.loc[sub["event_type"] == _WF_STEPS[0], "ts_us"].to_numpy(
                np.int64
            )
        )
        if len(views) == 0:
            continue
        clicks = np.sort(
            sub.loc[sub["event_type"] == _WF_STEPS[1], "ts_us"].to_numpy(
                np.int64
            )
        )
        purch = np.sort(
            sub.loc[sub["event_type"] == _WF_STEPS[2], "ts_us"].to_numpy(
                np.int64
            )
        )
        best = 1
        if len(clicks):
            # earliest click strictly after each view
            ci = np.searchsorted(clicks, views, side="right")
            ok = ci < len(clicks)
            within = ok & (clicks[np.minimum(ci, len(clicks) - 1)]
                           <= views + _WF_WINDOW_US)
            if within.any():
                best = 2
                if len(purch):
                    cts = clicks[np.minimum(ci, len(clicks) - 1)]
                    pi = np.searchsorted(purch, cts, side="right")
                    pok = within & (pi < len(purch))
                    pin = pok & (
                        purch[np.minimum(pi, len(purch) - 1)]
                        <= views + _WF_WINDOW_US
                    )
                    if pin.any():
                        best = 3
        lv.append(best)
    if not lv:
        return empty
    levels = np.asarray(lv, np.int64)
    return pd.DataFrame(
        {"level": np.arange(1, len(_WF_STEPS) + 1, dtype=np.int64),
         "n_users": np.asarray(
             [(levels >= k).sum() for k in range(1, len(_WF_STEPS) + 1)],
             np.int64,
         )}
    )


ORACLES248["events_window_funnel"] = f"""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'view'
),
c AS (
  SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
  WHERE event_type = 'purchase'
),
l2 AS (
  SELECT DISTINCT v.user_id
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.t > v.t AND c.t <= v.t + {_WF_WINDOW_US}
),
l3 AS (
  SELECT DISTINCT v.user_id
  FROM v
  JOIN c ON v.user_id = c.user_id
   AND c.t > v.t AND c.t <= v.t + {_WF_WINDOW_US}
  JOIN p ON v.user_id = p.user_id
   AND p.t > c.t AND p.t <= v.t + {_WF_WINDOW_US}
),
u AS (SELECT DISTINCT user_id FROM v)
SELECT CAST(lvl AS BIGINT) AS level,
       CAST(CASE lvl WHEN 1 THEN (SELECT count(*) FROM u)
                     WHEN 2 THEN (SELECT count(*) FROM l2)
                     ELSE (SELECT count(*) FROM l3) END AS BIGINT)
         AS n_users
FROM unnest([1, 2, 3]) AS t(lvl) ORDER BY lvl"""


# ---------------------------------------------------------------------------
# events_rolling_distinct — 7-day rolling distinct users per day
# ---------------------------------------------------------------------------


def q_events_rolling_distinct(sf_dir: str):
    """Per active day d: distinct users over the trailing 7-day window
    [d−6, d], the day's own distinct users, and the day's NEW users
    (first-ever activity on d). Output: day, n_users_day, n_users_7d,
    n_new_users.

    Scale shape: the distinct (user, day) pair fold is bounded by
    users×days; window counts fold that table, not the event stream."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id"]).to_pandas()
        ts = pd.Series(t["ts"].to_numpy(zero_copy_only=False))
        df["day"] = (
            ts.values.astype("datetime64[D]").astype(np.int64)
        ).astype(np.int64)
        return df.drop_duplicates()

    pairs = (
        ray.data.read_parquet(path, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["day", "n_users_day", "n_users_7d", "n_new_users"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if pairs.empty:
        return empty
    first = pairs.groupby("user_id")["day"].min()
    days = np.sort(pairs["day"].unique())
    rows = []
    by_day = pairs.groupby("day")["user_id"]
    day_sets = {d: set(g) for d, g in by_day}
    for d in days:
        window = set()
        for k in range(_RD_WINDOW):
            window |= day_sets.get(d - k, set())
        rows.append(
            (np.int64(d), np.int64(len(day_sets[d])),
             np.int64(len(window)),
             np.int64(int((first == d).sum())))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES248["events_rolling_distinct"] = f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400.0) AS BIGINT) AS day
  FROM events
),
days AS (SELECT DISTINCT day FROM pairs),
firsts AS (SELECT user_id, min(day) AS f FROM pairs GROUP BY 1),
win AS (
  SELECT days.day, count(DISTINCT pairs.user_id) AS n7
  FROM days JOIN pairs
    ON pairs.day BETWEEN days.day - {_RD_WINDOW - 1} AND days.day
  GROUP BY 1
),
own AS (SELECT day, count(*) AS nd FROM pairs GROUP BY 1),
newu AS (SELECT f AS day, count(*) AS nn FROM firsts GROUP BY 1)
SELECT days.day,
       CAST(own.nd AS BIGINT) AS n_users_day,
       CAST(win.n7 AS BIGINT) AS n_users_7d,
       CAST(coalesce(newu.nn, 0) AS BIGINT) AS n_new_users
FROM days
JOIN own ON days.day = own.day
JOIN win ON days.day = win.day
LEFT JOIN newu ON days.day = newu.day
ORDER BY days.day"""


QUERIES248 = {
    "events_window_funnel": q_events_window_funnel,
    "events_rolling_distinct": q_events_rolling_distinct,
}
