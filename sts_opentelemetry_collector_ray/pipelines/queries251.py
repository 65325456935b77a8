"""Driver-contract queries, wave 251 — the Hodges-Lehmann location
estimator (1963: median of Walsh averages) of daily counts per event type
and the exact two-sided sign test (binomial tail via lgamma, evaluated
identically in both engines) on consecutive-day count changes.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES251: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_hodges_lehmann — median of Walsh averages per type
# ---------------------------------------------------------------------------


def q_events_hodges_lehmann(sf_dir: str):
    """Per event type: the Hodges-Lehmann pseudomedian of daily counts —
    the median of all n(n+1)/2 Walsh averages (x_i + x_j)/2, i ≤ j
    (types with < 5 days drop). Output: event_type, n_days, n_walsh,
    hl_micro.

    Scale shape: bounded daily fold; the Walsh set is an upper-triangle
    broadcast on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_days", "n_walsh", "hl_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        n = len(y)
        if n < 5:
            continue
        iu = np.triu_indices(n, k=0)
        walsh = (y[iu[0]] + y[iu[1]]) / 2.0
        hl = float(np.median(walsh))
        rows.append(
            (et, np.int64(n), np.int64(len(walsh)),
             np.int64(np.floor(hl * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES251["events_hodges_lehmann"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
walsh AS (
  SELECT a.event_type, any_value(a.n) AS n, (a.y + b.y) / 2.0 AS w
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND b.t >= a.t
  WHERE a.n >= 5
  GROUP BY a.event_type, a.t, b.t, a.y, b.y
)
SELECT event_type, CAST(any_value(n) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_walsh,
       CAST(floor(median(w) * 1000000.0 + 0.5) AS BIGINT) AS hl_micro
FROM walsh GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# events_sign_test — exact binomial sign test on daily changes
# ---------------------------------------------------------------------------


def q_events_sign_test(sf_dir: str):
    """Per event type: the exact two-sided sign test that consecutive-day
    count changes are symmetric — with m nonzero diffs and s increases,
    p = min(1, 2·Σ_{k≤min(s,m−s)} C(m,k)/2^m) (binomial terms via lgamma
    so both engines evaluate the same expression; types with m < 5 drop).
    Output: event_type, m, s, p_micro.

    Scale shape: bounded daily fold; the binomial tail is a ≤ m-term sum
    on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "m", "s", "p_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub.sort_values("day")["n"].to_numpy(np.float64)
        d = np.diff(y)
        d = d[d != 0.0]
        m = len(d)
        if m < 5:
            continue
        s = int((d > 0.0).sum())
        lo = min(s, m - s)
        tail = sum(
            math.exp(
                math.lgamma(m + 1)
                - math.lgamma(k + 1)
                - math.lgamma(m - k + 1)
                - m * math.log(2.0)
            )
            for k in range(lo + 1)
        )
        p = min(1.0, 2.0 * tail)
        rows.append(
            (et, np.int64(m), np.int64(s),
             np.int64(np.floor(p * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES251["events_sign_test"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
lagd AS (
  SELECT event_type,
         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS d
  FROM daily
),
nz AS (SELECT event_type, d FROM lagd WHERE d IS NOT NULL AND d <> 0.0),
ms AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CASE WHEN d > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM nz GROUP BY 1 HAVING count(*) >= 5
),
tail AS (
  SELECT ms.event_type, ms.m, ms.s,
         sum(exp(lgamma(ms.m + 1.0) - lgamma(k + 1.0)
                 - lgamma(ms.m - k + 1.0) - ms.m * ln(2.0))) AS t
  FROM ms, unnest(range(0, 100000)) AS u(k)
  WHERE k <= least(ms.s, ms.m - ms.s)
  GROUP BY 1, 2, 3
)
SELECT event_type, m, s,
       CAST(floor(least(1.0, 2.0 * t) * 1000000.0 + 0.5) AS BIGINT)
         AS p_micro
FROM tail ORDER BY event_type"""


QUERIES251 = {
    "events_hodges_lehmann": q_events_hodges_lehmann,
    "events_sign_test": q_events_sign_test,
}
