"""Driver-contract queries, wave 249 — generalized ESD outlier rounds
(Rosner 1983: iteratively remove the max-|z| day from the total daily
count series, reporting each round's test statistic) and Dixon's Q ratio
test (1950) of the extreme daily counts per event type.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES249: dict[str, str] = {}

_ESD_ROUNDS = 3


# ---------------------------------------------------------------------------
# events_gesd — generalized ESD rounds over total daily counts
# ---------------------------------------------------------------------------


def q_events_gesd(sf_dir: str):
    """Rosner's generalized ESD over TOTAL daily counts, 3 rounds: each
    round computes R = max|x − x̄|/s (population s) over the remaining
    days, reports and removes the arg-max day (ties → smallest day).
    Output per round: round, day_removed, n_remaining, r_micro.

    Scale shape: bounded daily fold; each round is a vectorized scan of
    ≤ |days| values on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["round", "day_removed", "n_remaining", "r_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    tot = daily.groupby("day")["n"].sum().sort_index()
    days = tot.index.to_numpy(np.int64)
    x = tot.to_numpy(np.float64)
    rows = []
    for r in range(1, _ESD_ROUNDS + 1):
        n = len(x)
        if n < 3:
            break
        mu = x.sum() / n
        s = np.sqrt(((x - mu) ** 2).sum() / n)
        if s <= 0.0:
            break
        dev = np.abs(x - mu)
        mx = dev.max()
        # ties resolve to the smallest day
        i = int(np.flatnonzero(dev == mx).min())
        rows.append(
            (np.int64(r), np.int64(days[i]), np.int64(n),
             np.int64(np.floor(mx / s * 1_000_000.0 + 0.5)))
        )
        keep = np.ones(n, dtype=bool)
        keep[i] = False
        x, days = x[keep], days[keep]
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES249["events_gesd"] = f"""
WITH d0 AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
s0 AS (
  SELECT avg(y) AS m, sqrt(avg(y * y) - avg(y) * avg(y)) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM d0
),
p0 AS (
  SELECT d0.day, abs(d0.y - s0.m) / s0.s AS r, s0.n
  FROM d0, s0 WHERE s0.n >= 3 AND s0.s > 0.0
),
w0 AS (SELECT day, r, n FROM p0 ORDER BY r DESC, day ASC LIMIT 1),
d1 AS (SELECT d0.* FROM d0, w0 WHERE d0.day <> w0.day),
s1 AS (
  SELECT avg(y) AS m, sqrt(avg(y * y) - avg(y) * avg(y)) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM d1
),
p1 AS (
  SELECT d1.day, abs(d1.y - s1.m) / s1.s AS r, s1.n
  FROM d1, s1 WHERE s1.n >= 3 AND s1.s > 0.0
),
w1 AS (SELECT day, r, n FROM p1 ORDER BY r DESC, day ASC LIMIT 1),
d2 AS (SELECT d1.* FROM d1, w1 WHERE d1.day <> w1.day),
s2 AS (
  SELECT avg(y) AS m, sqrt(avg(y * y) - avg(y) * avg(y)) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM d2
),
p2 AS (
  SELECT d2.day, abs(d2.y - s2.m) / s2.s AS r, s2.n
  FROM d2, s2 WHERE s2.n >= 3 AND s2.s > 0.0
),
w2 AS (SELECT day, r, n FROM p2 ORDER BY r DESC, day ASC LIMIT 1),
allr AS (
  SELECT 1 AS rnd, day, n, r FROM w0
  UNION ALL SELECT 2, day, n, r FROM w1
  UNION ALL SELECT 3, day, n, r FROM w2
)
SELECT CAST(rnd AS BIGINT) AS round, day AS day_removed,
       n AS n_remaining,
       CAST(floor(r * 1000000.0 + 0.5) AS BIGINT) AS r_micro
FROM allr ORDER BY rnd"""


# ---------------------------------------------------------------------------
# events_dixon_q — Dixon's Q for the extreme daily counts per type
# ---------------------------------------------------------------------------


def q_events_dixon_q(sf_dir: str):
    """Per event type over its daily counts (n ≥ 4, nonzero range):
    Dixon's Q for the high extreme (x_(n)−x_(n−1))/(x_(n)−x_(1)) and for
    the low extreme (x_(2)−x_(1))/(x_(n)−x_(1)). Output: event_type,
    n_days, q_high_micro, q_low_micro.

    Scale shape: bounded daily fold; sorted extremes per type on the
    driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_days", "q_high_micro", "q_low_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = np.sort(sub["n"].to_numpy(np.float64))
        n = len(y)
        if n < 4:
            continue
        rng = y[-1] - y[0]
        if rng <= 0.0:
            continue
        qh = (y[-1] - y[-2]) / rng
        ql = (y[1] - y[0]) / rng
        rows.append(
            (et, np.int64(n),
             np.int64(np.floor(qh * 1_000_000.0 + 0.5)),
             np.int64(np.floor(ql * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES249["events_dixon_q"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY y) AS a,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
ext AS (
  SELECT event_type, any_value(n) AS n,
         max(CASE WHEN a = n THEN y END) AS xn,
         max(CASE WHEN a = n - 1 THEN y END) AS xn1,
         max(CASE WHEN a = 2 THEN y END) AS x2,
         max(CASE WHEN a = 1 THEN y END) AS x1
  FROM rk GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor((xn - xn1) / (xn - x1) * 1000000.0 + 0.5) AS BIGINT)
         AS q_high_micro,
       CAST(floor((x2 - x1) / (xn - x1) * 1000000.0 + 0.5) AS BIGINT)
         AS q_low_micro
FROM ext WHERE n >= 4 AND xn - x1 > 0.0 ORDER BY event_type"""


QUERIES249 = {
    "events_gesd": q_events_gesd,
    "events_dixon_q": q_events_dixon_q,
}
