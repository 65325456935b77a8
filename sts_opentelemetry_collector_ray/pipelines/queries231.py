"""Driver-contract queries, wave 231 — secretary-rule (1/e) optimal-stopping
replay over the daily value-mean series and EVT Value-at-Risk / Expected
Shortfall from the wave-186 method-of-moments GPD tail fit.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES231: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_secretary_rule — 1/e stopping replay on daily means
# ---------------------------------------------------------------------------


def q_events_secretary_rule(sf_dir: str):
    """Secretary-problem replay per event type over daily MEAN values in
    calendar order: observe the first r = ⌈n/e⌉ days, then accept the
    first day beating every observed day (else the last day). Output:
    event_type, n_days, r_observe, picked_day, is_best (picked the global
    maximum; ties by day order — earlier wins as 'the' max).

    Scale shape: bounded daily fold + one vectorized scan per type — no
    shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts", "value"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        df["n"] = 1
        return df.groupby(["event_type", "day"], sort=False, as_index=False).agg(
            n=("n", "sum"), s=("value", "sum")
        ).astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_days", "r_observe", "picked_day", "is_best"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)[["n", "s"]]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        v = sub["s"].to_numpy(np.float64) / sub["n"].to_numpy(np.float64)
        day = sub["day"].to_numpy(np.int64)
        n = len(v)
        if n < 3:
            continue
        r = int(math.ceil(n / math.e))
        if r >= n:
            r = n - 1
        thresh = v[:r].max()
        later = np.flatnonzero(v[r:] > thresh)
        pick = (r + later[0]) if len(later) else (n - 1)
        best = int(np.argmax(v))  # first max wins
        rows.append(
            (et, np.int64(n), np.int64(r), np.int64(day[pick]),
             np.int64(1 if pick == best else 0))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES231["events_secretary_rule"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         sum(value) / count(*) AS v
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, v,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
r AS (
  SELECT event_type, n,
         least(CAST(ceil(n / exp(1.0)) AS BIGINT), n - 1) AS ro
  FROM (SELECT DISTINCT event_type, n FROM idx WHERE n >= 3)
),
thr AS (
  SELECT idx.event_type, max(idx.v) AS th
  FROM idx JOIN r ON idx.event_type = r.event_type
  WHERE idx.t <= r.ro GROUP BY 1
),
cand AS (
  SELECT idx.event_type, idx.day, idx.t,
         row_number() OVER (PARTITION BY idx.event_type ORDER BY idx.t)
           AS cr
  FROM idx JOIN r ON idx.event_type = r.event_type
  JOIN thr ON idx.event_type = thr.event_type
  WHERE idx.t > r.ro AND idx.v > thr.th
),
pick AS (
  SELECT r.event_type, r.n, r.ro,
         coalesce((SELECT day FROM cand
                   WHERE cand.event_type = r.event_type AND cand.cr = 1),
                  (SELECT day FROM idx
                   WHERE idx.event_type = r.event_type AND idx.t = r.n))
           AS picked_day
  FROM r
),
best AS (
  SELECT event_type, day AS best_day FROM (
    SELECT event_type, day,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY v DESC, t ASC) AS br
    FROM idx
  ) WHERE br = 1
)
SELECT pick.event_type, CAST(pick.n AS BIGINT) AS n_days,
       CAST(pick.ro AS BIGINT) AS r_observe,
       CAST(pick.picked_day AS BIGINT) AS picked_day,
       CAST(CASE WHEN pick.picked_day = best.best_day THEN 1 ELSE 0 END
            AS BIGINT) AS is_best
FROM pick JOIN best ON pick.event_type = best.event_type
ORDER BY pick.event_type"""


# ---------------------------------------------------------------------------
# events_evt_var — VaR and expected shortfall from the GPD tail
# ---------------------------------------------------------------------------


def q_events_evt_var(sf_dir: str):
    """EVT risk metrics per event type (composing the wave-186 POT fit):
    threshold u = mean + 2σ, MoM GPD (ξ, β) over excesses, exceedance rate
    ζ = n_exc/n; VaR_q = u + (β/ξ)·[((1−q)/ζ)^(−ξ) − 1] and ES_q =
    (VaR_q + β − ξu)/(1−ξ) at q = 0.99 (McNeil & Frey 2000). Types with
    <2 exceedances, ξ ≥ 1 or zero excess variance drop. Output:
    event_type, n_exceed, var99_micro, es99_micro.

    Scale shape: two single-pass bounded combiners (same as
    events_pot_gpd) — no shuffle."""
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        v = df["value"].to_numpy(np.float64)
        df["s"] = v
        df["s2"] = v * v
        return df.groupby("event_type", sort=False, as_index=False).agg(
            n=("s", "size"), s=("s", "sum"), s2=("s2", "sum")
        ).astype({"n": np.int64})

    stp = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    cols = ["event_type", "n_exceed", "var99_micro", "es99_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if stp.empty:
        return empty
    st = stp.groupby("event_type").sum()
    mean = st["s"].to_numpy(np.float64) / st["n"].to_numpy(np.float64)
    var = st["s2"].to_numpy(np.float64) / st["n"].to_numpy(np.float64) - mean * mean
    u = mean + 2.0 * np.sqrt(np.maximum(var, 0.0))
    types = np.asarray(st.index.to_numpy(object))
    order = np.argsort(types)
    tkeys, tu = types[order], u[order]
    tn = st["n"].to_numpy(np.float64)[order]

    def excess_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        et = df["event_type"].to_numpy(object)
        uu = tu[np.searchsorted(tkeys, et)]
        x = df["value"].to_numpy(np.float64) - uu
        keep = x > 0.0
        sub = pd.DataFrame({"event_type": et[keep], "x": x[keep]})
        sub["x2"] = sub["x"].to_numpy() ** 2
        return sub.groupby("event_type", sort=False, as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sxx=("x2", "sum")
        ).astype({"n": np.int64})

    exp_ = ds.map_batches(excess_partial, batch_format="pyarrow").to_pandas()
    if exp_.empty:
        return empty
    ex = exp_.groupby("event_type").sum()
    rows = []
    q = 0.99
    for et in sorted(ex.index):
        i = int(np.searchsorted(tkeys, et))
        ne = int(ex.loc[et, "n"])
        if ne < 2:
            continue
        m = ex.loc[et, "sx"] / ne
        s2 = ex.loc[et, "sxx"] / ne - m * m
        if s2 <= 0.0:
            continue
        r = m * m / s2
        xi = 0.5 * (1.0 - r)
        beta = 0.5 * m * (r + 1.0)
        if xi >= 1.0 or xi == 0.0:
            continue
        zeta = ne / tn[i]
        var_q = tu[i] + (beta / xi) * (((1.0 - q) / zeta) ** (-xi) - 1.0)
        es_q = (var_q + beta - xi * tu[i]) / (1.0 - xi)
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append((et, np.int64(ne), micro(var_q), micro(es_q)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES231["events_evt_var"] = """
WITH st AS (
  SELECT event_type, count(*) AS n, sum(value) AS s, sum(value * value) AS s2
  FROM events GROUP BY 1
),
u AS (
  SELECT event_type, CAST(n AS DOUBLE) AS n_all,
         s / n + 2.0 * sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) AS u
  FROM st
),
ex AS (
  SELECT e.event_type, e.value - u.u AS x
  FROM events e JOIN u ON e.event_type = u.event_type
  WHERE e.value > u.u
),
m AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
  FROM ex GROUP BY 1 HAVING count(*) >= 2
),
f AS (
  SELECT m.event_type, m.n, u.u, u.n_all,
         sx / m.n AS mm, sxx / m.n - (sx / m.n) * (sx / m.n) AS s2v
  FROM m JOIN u ON m.event_type = u.event_type
),
g AS (
  SELECT event_type, n, u, n_all,
         0.5 * (1.0 - mm * mm / s2v) AS xi,
         0.5 * mm * (mm * mm / s2v + 1.0) AS beta,
         CAST(n AS DOUBLE) / n_all AS zeta
  FROM f WHERE s2v > 0.0
),
v AS (
  SELECT event_type, n,
         u + (beta / xi) * (pow((1.0 - 0.99) / zeta, -xi) - 1.0) AS var_q,
         xi, beta, u
  FROM g WHERE xi < 1.0 AND xi <> 0.0
)
SELECT event_type, CAST(n AS BIGINT) AS n_exceed,
       CAST(floor(var_q * 1000000.0 + 0.5) AS BIGINT) AS var99_micro,
       CAST(floor((var_q + beta - xi * u) / (1.0 - xi) * 1000000.0 + 0.5)
            AS BIGINT) AS es99_micro
FROM v ORDER BY event_type"""


QUERIES231 = {
    "events_secretary_rule": q_events_secretary_rule,
    "events_evt_var": q_events_evt_var,
}
