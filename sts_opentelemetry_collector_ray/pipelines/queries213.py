"""Driver-contract queries, wave 213 — isotonic (nondecreasing) regression
of the daily count series via the exact minimax characterization
ŷ_i = max_{j≤i} min_{k≥i} mean(y_j..y_k) and a concentration-bounds audit
(CLT vs Hoeffding vs Bernstein half-widths for the mean order value).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES213: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_isotonic_fit — exact minimax isotonic regression per type
# ---------------------------------------------------------------------------


def q_events_isotonic_fit(sf_dir: str):
    """Per event type: the isotonic (nondecreasing) least-squares fit of
    daily counts vs day order, via the exact minimax formula ŷ_i =
    max_{j≤i} min_{k≥i} mean(y_j..y_k) (Robertson-Wright-Dykstra 1988) —
    window means come from exact integer prefix sums, so both engines
    produce bit-identical fits. Output: event_type, n_days, n_levels
    (distinct fitted values), fit_first_micro, fit_last_micro, sse_int.

    Scale shape: bounded daily fold; the O(n²) window matrix per type is a
    dense driver computation (n ≤ days)."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        return (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "event_type", "n_days", "n_levels", "fit_first_micro",
        "fit_last_micro", "sse_int",
    ]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        n = len(y)
        if n < 1:
            continue
        cs = np.concatenate([[0.0], np.cumsum(y)])
        j = np.arange(n)[:, None]
        k = np.arange(n)[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = (cs[k + 1] - cs[j]) / (k - j + 1).astype(np.float64)
        avg[k < j] = np.inf  # invalid windows
        # sm[j, i] = min over k >= i of avg(j, k): reversed cumulative min
        sm = np.minimum.accumulate(avg[:, ::-1], axis=1)[:, ::-1]
        sm[k < j] = -np.inf  # j > i never participates in the max
        fit = np.maximum.accumulate(sm, axis=0).diagonal().copy()
        lv = int((np.diff(fit) != 0.0).sum()) + 1
        sse = float(((y - fit) ** 2).sum())
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (et, np.int64(n), np.int64(lv), micro(fit[0]), micro(fit[-1]),
             np.int64(np.floor(sse + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES213["events_isotonic_fit"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         sum(y) OVER (PARTITION BY event_type ORDER BY day) AS cs,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
win AS (
  SELECT a.event_type, a.t AS j, b.t AS k,
         (b.cs - (a.cs - a.y)) / (b.t - a.t + 1) AS avg
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND b.t >= a.t
),
sm AS (
  SELECT event_type, j, k AS i,
         min(avg) OVER (PARTITION BY event_type, j ORDER BY k DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS smin
  FROM win
),
fit0 AS (
  SELECT event_type, i,
         max(smin) OVER (PARTITION BY event_type, i ORDER BY j
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS fmax,
         j
  FROM sm WHERE j <= i
),
fit AS (
  SELECT event_type, i, fmax AS fit FROM fit0 WHERE j = i
),
f2 AS (
  SELECT fit.event_type, fit.i, fit.fit, idx.y, idx.n,
         lag(fit.fit) OVER (PARTITION BY fit.event_type ORDER BY fit.i)
           AS prev
  FROM fit JOIN idx ON fit.event_type = idx.event_type AND fit.i = idx.t
)
SELECT event_type,
       CAST(any_value(n) AS BIGINT) AS n_days,
       CAST(1 + sum(CASE WHEN prev IS NOT NULL AND fit <> prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_levels,
       CAST(floor(min(CASE WHEN i = 1 THEN fit END) * 1000000.0 + 0.5)
            AS BIGINT) AS fit_first_micro,
       CAST(floor(min(CASE WHEN i = n THEN fit END)
                  * 1000000.0 + 0.5) AS BIGINT) AS fit_last_micro,
       CAST(floor(sum((y - fit) * (y - fit)) + 0.5) AS BIGINT) AS sse_int
FROM f2 GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# orders_concentration_bounds — CLT vs Hoeffding vs Bernstein half-widths
# ---------------------------------------------------------------------------


def q_orders_concentration_bounds(sf_dir: str):
    """Distribution-free confidence audit for the mean order value at 95%:
    CLT half-width 1.96·σ/√n, Hoeffding R·√(ln(2/δ)/(2n)) and Bernstein
    √(2σ²ln(2/δ)/n) + R·ln(2/δ)/(3n) with R = observed max (support
    [0, R]). One row: n, mean_micro, clt_hw_micro, hoeffding_hw_micro,
    bernstein_hw_micro, hoeffding_over_clt_micro.

    Scale shape: one (n, Σv, Σv², max) combiner; driver folds blocks
    rows — no shuffle."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        v = np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
        return pd.DataFrame(
            {"n": [np.int64(len(v))], "s": [v.sum()], "s2": [(v * v).sum()],
             "mx": [v.max() if len(v) else 0.0]}
        )

    part = (
        ray.data.read_parquet(path, columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "n", "mean_micro", "clt_hw_micro", "hoeffding_hw_micro",
        "bernstein_hw_micro", "hoeffding_over_clt_micro",
    ]
    if part.empty or part["n"].sum() < 2:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = float(part["n"].sum())
    s = float(part["s"].sum())
    s2 = float(part["s2"].sum())
    r = float(part["mx"].max())
    mean = s / n
    var = max(s2 / n - mean * mean, 0.0)
    sd = math.sqrt(var)
    l2d = math.log(2.0 / 0.05)
    clt = 1.96 * sd / math.sqrt(n)
    hoef = r * math.sqrt(l2d / (2.0 * n))
    bern = math.sqrt(2.0 * var * l2d / n) + r * l2d / (3.0 * n)
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "mean_micro": [micro(mean)],
            "clt_hw_micro": [micro(clt)],
            "hoeffding_hw_micro": [micro(hoef)],
            "bernstein_hw_micro": [micro(bern)],
            "hoeffding_over_clt_micro": [micro(hoef / clt)],
        }
    )


ORACLES213["orders_concentration_bounds"] = """
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(o_totalprice) AS s,
         sum(o_totalprice * o_totalprice) AS s2, max(o_totalprice) AS r
  FROM orders HAVING count(*) >= 2
),
d AS (
  SELECT n, s / n AS mean,
         sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS sd,
         greatest(s2 / n - (s / n) * (s / n), 0.0) AS var, r,
         ln(2.0 / 0.05) AS l2d
  FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(mean * 1000000.0 + 0.5) AS BIGINT) AS mean_micro,
       CAST(floor(1.96 * sd / sqrt(n) * 1000000.0 + 0.5) AS BIGINT)
         AS clt_hw_micro,
       CAST(floor(r * sqrt(l2d / (2.0 * n)) * 1000000.0 + 0.5) AS BIGINT)
         AS hoeffding_hw_micro,
       CAST(floor((sqrt(2.0 * var * l2d / n) + r * l2d / (3.0 * n))
                  * 1000000.0 + 0.5) AS BIGINT) AS bernstein_hw_micro,
       CAST(floor(r * sqrt(l2d / (2.0 * n)) / (1.96 * sd / sqrt(n))
                  * 1000000.0 + 0.5) AS BIGINT) AS hoeffding_over_clt_micro
FROM d"""


QUERIES213 = {
    "events_isotonic_fit": q_events_isotonic_fit,
    "orders_concentration_bounds": q_orders_concentration_bounds,
}
