"""Driver-contract queries, wave 353 — lifetime-shape census (are a
user's events front-loaded or back-loaded within their own tenure?) and
the value-timing shift (does the value-weighted hour profile differ
from the count profile?). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES353: dict[str, str] = {}

_LS_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_lifetime_shape — front-loaded / balanced / back-loaded census
# ---------------------------------------------------------------------------


def q_users_lifetime_shape(sf_dir: str):
    """Lifetime shape: per user with >= 10 events and tenure >= 2 us,
    the share of events in the FIRST HALF of their own [first, last]
    span (strictly before the midpoint (first + last) // 2);
    front-loaded when 5 * first_half > 3 * n (> 0.6), back-loaded when
    5 * first_half < 2 * n (< 0.4), else balanced — all EXACT integer
    comparisons. Per class: shape, n_users, share_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"u": u, "us": us})
        df["_b"] = (df["u"] % _LS_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "shape": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        stats = g.groupby("u")["us"].agg(["min", "max", "size"])
        gg = g.merge(
            stats.rename(
                columns={"min": "f", "max": "l", "size": "cnt"}
            ).reset_index(),
            on="u",
        )
        mid = (gg["f"].to_numpy(np.int64) + gg["l"].to_numpy(np.int64)) // 2
        gg = gg.assign(h1=(gg["us"].to_numpy(np.int64) < mid).astype(
            np.int64
        ))
        per = gg.groupby("u").agg(
            n=("h1", "size"), h1=("h1", "sum"), f=("f", "first"),
            l=("l", "first"),
        )
        per = per[(per["n"] >= 10) & (per["l"] > per["f"])]
        if len(per) == 0:
            return zero
        n = per["n"].to_numpy(np.int64)
        h1 = per["h1"].to_numpy(np.int64)
        shape = np.where(
            5 * h1 > 3 * n, "front",
            np.where(5 * h1 < 2 * n, "back", "balanced"),
        )
        h = pd.Series(shape).value_counts()
        return pd.DataFrame(
            {
                "shape": h.index.to_numpy(object),
                "n": h.to_numpy(np.int64),
            }
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("shape")["n"]
        .sum()
    )
    cols = ["shape", "n_users", "share_micro"]
    empty = pd.DataFrame(
        {
            "shape": pd.Series([], dtype=object),
            "n_users": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if h.empty:
        return empty
    total = int(h.sum())
    rows = []
    for k in ("back", "balanced", "front"):
        n = int(h.get(k, 0))
        rows.append(
            (
                k, np.int64(n),
                np.int64(np.floor(
                    float(n) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_users": np.int64, "share_micro": np.int64}
    )


ORACLES353["users_lifetime_shape"] = """
WITH per AS (
  SELECT user_id, epoch_us(ts) AS us,
         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS f,
         max(epoch_us(ts)) OVER (PARTITION BY user_id) AS l
  FROM events
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN us < (f + l) // 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS h1,
         max(f) AS f, max(l) AS l
  FROM per GROUP BY 1
),
cls AS (
  SELECT CASE WHEN 5 * h1 > 3 * n THEN 'front'
              WHEN 5 * h1 < 2 * n THEN 'back'
              ELSE 'balanced' END AS shape
  FROM agg WHERE n >= 10 AND l > f
),
h AS (
  SELECT shape, CAST(count(*) AS BIGINT) AS n_users FROM cls GROUP BY 1
),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM h),
shapes AS (SELECT unnest(['back', 'balanced', 'front']) AS shape)
SELECT s.shape,
       CAST(coalesce(h.n_users, 0) AS BIGINT) AS n_users,
       CAST(floor(CAST(coalesce(h.n_users, 0) AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro
FROM shapes s LEFT JOIN h USING (shape), tot
WHERE tot.t > 0
ORDER BY s.shape"""


# ---------------------------------------------------------------------------
# events_value_timing_shift — value-weighted vs count hour profiles
# ---------------------------------------------------------------------------


def q_events_value_timing_shift(sf_dir: str):
    """Value timing: the hour-of-day profile by event COUNT vs by value
    CENTS; L1 distance between the two share vectors plus each
    profile's peak hour (max, earliest tie). Counts and cent sums are
    exact; shares are mirrored float. One row: l1_micro,
    peak_hour_by_count, peak_hour_by_value."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hod = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy()
            // 3_600_000_000
        ) % 24
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"h": hod, "n": 1, "s": cents})
        return df.groupby("h", as_index=False).sum().astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("h")[["n", "s"]]
        .sum()
    )
    cols = ["l1_micro", "peak_hour_by_count", "peak_hour_by_value"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    n_v = np.array([int(m["n"].get(h, 0)) for h in range(24)], np.int64)
    s_v = np.array([int(m["s"].get(h, 0)) for h in range(24)], np.int64)
    nt, st = int(n_v.sum()), int(s_v.sum())
    if nt == 0 or st <= 0:
        return empty
    l1 = float(
        np.abs(
            n_v.astype(np.float64) / float(nt)
            - s_v.astype(np.float64) / float(st)
        ).sum()
    )
    return pd.DataFrame(
        [
            (
                np.int64(np.floor(l1 * 1_000_000.0 + 0.5)),
                np.int64(int(np.argmax(n_v))),
                np.int64(int(np.argmax(s_v))),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES353["events_value_timing_shift"] = """
WITH b AS (
  SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS h,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
hrs AS (SELECT CAST(r.range AS BIGINT) AS h FROM range(0, 24) r),
m AS (
  SELECT hrs.h,
         CAST(coalesce(sum(CASE WHEN b.h = hrs.h THEN 1 END), 0)
              AS BIGINT) AS n,
         CAST(coalesce(sum(CASE WHEN b.h = hrs.h THEN b.cents END), 0)
              AS BIGINT) AS s
  FROM hrs LEFT JOIN b ON b.h = hrs.h
  GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st
        FROM m),
l1 AS (
  SELECT sum(abs(CAST(m.n AS DOUBLE) / tot.nt
                 - CAST(m.s AS DOUBLE) / tot.st)) AS v
  FROM m, tot WHERE tot.nt > 0 AND tot.st > 0
),
pc AS (SELECT h FROM m ORDER BY n DESC, h LIMIT 1),
pv AS (SELECT h FROM m ORDER BY s DESC, h LIMIT 1)
SELECT CAST(floor(l1.v * 1000000.0 + 0.5) AS BIGINT) AS l1_micro,
       pc.h AS peak_hour_by_count, pv.h AS peak_hour_by_value
FROM l1, pc, pv"""


QUERIES353 = {
    "users_lifetime_shape": q_users_lifetime_shape,
    "events_value_timing_shift": q_events_value_timing_shift,
}
