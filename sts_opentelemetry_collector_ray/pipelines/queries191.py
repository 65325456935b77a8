"""Driver-contract queries, wave 191 — GEV block-maxima fit via L-moments
(weekly maxima of daily counts, Hosking's rational approximation) and the
Wald–Wolfowitz runs test around the median of the daily count series.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES191: dict[str, str] = {}


def _daily_counts(sf_dir: str) -> pd.DataFrame:
    """Folded (event_type, epoch_day, n) dimension table (bounded)."""
    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        day = (df["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        df["day"] = day.to_numpy(np.int64)
        g = (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if part.empty:
        return part
    return (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )


# ---------------------------------------------------------------------------
# events_gev_maxima — GEV fit over weekly block maxima (L-moments)
# ---------------------------------------------------------------------------


def q_events_gev_maxima(sf_dir: str):
    """Per event type: weekly block maxima of the daily count series
    (week = epoch_day // 7) fit to a GEV by L-moments (Hosking et al. 1985:
    c = 2/(3+τ₃) − ln2/ln3, k = 7.8590c + 2.9554c², σ = l₂k/((1−2⁻ᵏ)Γ(1+k)),
    μ = l₁ − σ(1−Γ(1+k))/k). Types with < 3 blocks or l₂ ≤ 0 drop.

    Scale shape: the daily combiner folds a bounded table; weekly maxima and
    the probability-weighted-moment sums are one vectorized pass per type —
    no shuffle."""
    daily = _daily_counts(sf_dir)
    cols = [
        "event_type", "n_blocks", "l1_micro", "l2_micro", "t3_micro",
        "k_micro", "sigma_micro", "mu_micro",
    ]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    daily = daily.assign(week=daily["day"].to_numpy(np.int64) // 7)
    wk = daily.groupby(["event_type", "week"], as_index=False)["n"].max()
    rows = []
    for et, sub in wk.groupby("event_type", sort=True):
        x = np.sort(sub["n"].to_numpy(np.float64))
        n = len(x)
        if n < 3:
            continue
        i = np.arange(1, n + 1, dtype=np.float64)
        b0 = x.sum() / n
        b1 = ((i - 1) / (n - 1) * x).sum() / n
        b2 = ((i - 1) * (i - 2) / ((n - 1) * (n - 2)) * x).sum() / n
        l1 = b0
        l2 = 2.0 * b1 - b0
        l3 = 6.0 * b2 - 6.0 * b1 + b0
        if l2 <= 0.0:
            continue
        t3 = l3 / l2
        c = 2.0 / (3.0 + t3) - math.log(2.0) / math.log(3.0)
        k = 7.8590 * c + 2.9554 * c * c
        gk = math.gamma(1.0 + k)
        sigma = l2 * k / ((1.0 - 2.0 ** (-k)) * gk)
        mu = l1 - sigma * (1.0 - gk) / k
        rows.append(
            (
                et, np.int64(n),
                *(np.int64(np.floor(v * 1_000_000.0 + 0.5))
                  for v in (l1, l2, t3, k, sigma, mu)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES191["events_gev_maxima"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
wk AS (
  SELECT event_type, day // 7 AS week, CAST(max(n) AS DOUBLE) AS x
  FROM daily GROUP BY 1, 2
),
o AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x) AS i,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM wk
),
b AS (
  SELECT event_type, any_value(n) AS n,
         sum(x) / any_value(n) AS b0,
         sum((i - 1.0) / (n - 1.0) * x) / any_value(n) AS b1,
         sum((i - 1.0) * (i - 2.0) / ((n - 1.0) * (n - 2.0)) * x)
           / any_value(n) AS b2
  FROM o WHERE n >= 3 GROUP BY 1
),
lm AS (
  SELECT event_type, n, b0 AS l1, 2.0 * b1 - b0 AS l2,
         6.0 * b2 - 6.0 * b1 + b0 AS l3
  FROM b
),
fit AS (
  SELECT event_type, n, l1, l2, l3 / l2 AS t3,
         7.8590 * (2.0 / (3.0 + l3 / l2) - ln(2.0) / ln(3.0))
         + 2.9554 * (2.0 / (3.0 + l3 / l2) - ln(2.0) / ln(3.0))
                  * (2.0 / (3.0 + l3 / l2) - ln(2.0) / ln(3.0)) AS k
  FROM lm WHERE l2 > 0.0
),
fin AS (
  SELECT event_type, n, l1, l2, t3, k,
         l2 * k / ((1.0 - 2.0 ** (-k)) * gamma(1.0 + k)) AS sigma
  FROM fit
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_blocks,
       CAST(floor(l1 * 1000000.0 + 0.5) AS BIGINT) AS l1_micro,
       CAST(floor(l2 * 1000000.0 + 0.5) AS BIGINT) AS l2_micro,
       CAST(floor(t3 * 1000000.0 + 0.5) AS BIGINT) AS t3_micro,
       CAST(floor(k * 1000000.0 + 0.5) AS BIGINT) AS k_micro,
       CAST(floor(sigma * 1000000.0 + 0.5) AS BIGINT) AS sigma_micro,
       CAST(floor((l1 - sigma * (1.0 - gamma(1.0 + k)) / k) * 1000000.0 + 0.5)
            AS BIGINT) AS mu_micro
FROM fin ORDER BY event_type"""


# ---------------------------------------------------------------------------
# events_runs_test — Wald–Wolfowitz runs test around the median
# ---------------------------------------------------------------------------


def q_events_runs_test(sf_dir: str):
    """Per event type: Wald–Wolfowitz runs test of the daily count series
    around its median (order statistic at (n+1)//2; days equal to the median
    drop): counts above/below, observed runs, and the normal-approximation
    z with E[R] = 2n₁n₂/(n₁+n₂) + 1. Types with n₁ = 0 or n₂ = 0 drop.

    Scale shape: bounded daily fold + one vectorized sign scan per type —
    no shuffle."""
    daily = _daily_counts(sf_dir)
    cols = ["event_type", "n_above", "n_below", "runs", "z_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        x = sub["n"].to_numpy(np.int64)  # already day-ordered
        med = np.sort(x)[(len(x) + 1) // 2 - 1]
        s = np.sign(x - med)
        s = s[s != 0]
        n1 = int((s > 0).sum())
        n2 = int((s < 0).sum())
        if n1 == 0 or n2 == 0:
            continue
        runs = int(1 + (s[1:] != s[:-1]).sum())
        nn = float(n1 + n2)
        er = 2.0 * n1 * n2 / nn + 1.0
        vr = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1.0))
        z = 0.0 if vr <= 0.0 else (runs - er) / math.sqrt(vr)
        rows.append(
            (et, np.int64(n1), np.int64(n2), np.int64(runs),
             np.int64(np.floor(z * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES191["events_runs_test"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, n AS m FROM (
    SELECT event_type, n,
           row_number() OVER (PARTITION BY event_type ORDER BY n) AS r,
           count(*) OVER (PARTITION BY event_type) AS nd
    FROM daily
  ) WHERE r = (nd + 1) // 2
),
sgn AS (
  SELECT daily.event_type, daily.day,
         CASE WHEN daily.n > med.m THEN 1 ELSE -1 END AS s
  FROM daily JOIN med ON daily.event_type = med.event_type
  WHERE daily.n <> med.m
),
runs AS (
  SELECT event_type, s,
         CASE WHEN s <> lag(s) OVER (PARTITION BY event_type ORDER BY day)
              THEN 1 ELSE 0 END AS chg
  FROM sgn
),
agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(1 + sum(coalesce(chg, 0)) AS BIGINT) AS runs
  FROM runs GROUP BY 1
),
f AS (
  SELECT event_type, n1, n2, runs,
         2.0 * n1 * n2 / (n1 + n2) + 1.0 AS er,
         2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1.0)) AS vr
  FROM agg WHERE n1 > 0 AND n2 > 0
)
SELECT event_type, n1 AS n_above, n2 AS n_below, runs,
       CAST(floor(CASE WHEN vr > 0.0 THEN (runs - er) / sqrt(vr) ELSE 0.0 END
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM f ORDER BY event_type"""


QUERIES191 = {
    "events_gev_maxima": q_events_gev_maxima,
    "events_runs_test": q_events_runs_test,
}
