"""Driver-contract queries, wave 203 — Bayesian A/B conversion comparison
(Beta(1,1) priors over hash-bucketed arms, normal-approximated P(B>A)) and
Newey-West HAC standard errors for the autocorrelated daily count series
(Bartlett kernel, 5 lags). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries197 import _phi_upper, _phi_upper_sql
from .queries200 import _mix64, _mix64_sql

ORACLES203: dict[str, str] = {}

_NW_LAGS = 5


# ---------------------------------------------------------------------------
# events_bayes_ab — Beta-posterior conversion comparison
# ---------------------------------------------------------------------------


def q_events_bayes_ab(sf_dir: str):
    """One-row Bayesian A/B readout: users split 50/50 by mix64(user) % 2,
    conversion = user has ≥ 1 'purchase' event, Beta(1,1) prior. Posterior
    means, the normal-approximation z = (m₁−m₀)/√(v₁+v₀) over posterior
    variances, and P(B>A) = Φ(z) via the A&S 26.2.17 polynomial. Output:
    n0, s0, n1, s1, m0_micro, m1_micro, z_micro, prob_micro.

    Scale shape: per-batch (user, converted) partials → ONE user-bucket
    exchange for exact per-user conversion → per-bucket (arm, n, s) counts;
    driver folds buckets × 2 rows."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id", "event_type"]).to_pandas()
        df["conv"] = (df["event_type"] == "purchase").astype(np.int64)
        g = df.groupby("user_id", sort=False, as_index=False)["conv"].max()
        g["_b"] = (g["user_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return g.astype({"conv": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False)["conv"].max()
        arm = (_mix64(u["user_id"].to_numpy(np.int64)) % np.uint64(2)).astype(
            np.int64
        )
        out = pd.DataFrame({"arm": arm, "n": 1, "s": u["conv"].to_numpy(np.int64)})
        return out.groupby("arm", as_index=False).sum().astype(np.int64)

    part = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n0", "s0", "n1", "s1", "m0_micro", "m1_micro", "z_micro", "prob_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby("arm").sum()
    if 0 not in g.index or 1 not in g.index:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n0, s0 = int(g.loc[0, "n"]), int(g.loc[0, "s"])
    n1, s1 = int(g.loc[1, "n"]), int(g.loc[1, "s"])
    m, v = [], []
    for n, s in ((n0, s0), (n1, s1)):
        a, b = 1.0 + s, 1.0 + n - s
        m.append(a / (a + b))
        v.append(a * b / ((a + b) * (a + b) * (a + b + 1.0)))
    z = (m[1] - m[0]) / np.sqrt(v[1] + v[0])
    prob = (
        1.0 - float(_phi_upper(np.array([z]))[0])
        if z >= 0.0
        else float(_phi_upper(np.array([-z]))[0])
    )
    micro = lambda x: np.int64(np.floor(x * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n0": [np.int64(n0)], "s0": [np.int64(s0)],
            "n1": [np.int64(n1)], "s1": [np.int64(s1)],
            "m0_micro": [micro(m[0])], "m1_micro": [micro(m[1])],
            "z_micro": [micro(float(z))], "prob_micro": [micro(prob)],
        }
    )


ORACLES203["events_bayes_ab"] = f"""
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
a AS (SELECT {_mix64_sql('user_id')} % 2 AS arm, conv FROM u),
g AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS s1
  FROM a
),
p AS (
  SELECT n0, s0, n1, s1,
         (1.0 + s0) / ((1.0 + s0) + (1.0 + n0 - s0)) AS m0,
         (1.0 + s1) / ((1.0 + s1) + (1.0 + n1 - s1)) AS m1,
         (1.0 + s0) * (1.0 + n0 - s0)
           / (((1.0 + s0) + (1.0 + n0 - s0)) * ((1.0 + s0) + (1.0 + n0 - s0))
              * ((1.0 + s0) + (1.0 + n0 - s0) + 1.0)) AS v0,
         (1.0 + s1) * (1.0 + n1 - s1)
           / (((1.0 + s1) + (1.0 + n1 - s1)) * ((1.0 + s1) + (1.0 + n1 - s1))
              * ((1.0 + s1) + (1.0 + n1 - s1) + 1.0)) AS v1
  FROM g WHERE n0 > 0 AND n1 > 0
),
z AS (SELECT n0, s0, n1, s1, m0, m1, (m1 - m0) / sqrt(v1 + v0) AS z FROM p)
SELECT n0, s0, n1, s1,
       CAST(floor(m0 * 1000000.0 + 0.5) AS BIGINT) AS m0_micro,
       CAST(floor(m1 * 1000000.0 + 0.5) AS BIGINT) AS m1_micro,
       CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
       CAST(floor((CASE WHEN z >= 0.0 THEN 1.0 - {_phi_upper_sql('z')}
                        ELSE {_phi_upper_sql('(-z)')} END)
                  * 1000000.0 + 0.5) AS BIGINT) AS prob_micro
FROM z"""


# ---------------------------------------------------------------------------
# events_newey_west — HAC standard error of the daily-count mean
# ---------------------------------------------------------------------------


def q_events_newey_west(sf_dir: str):
    """Per event type over the observed daily count series: Newey-West
    (1987) HAC variance of the mean with Bartlett weights over 5 lags —
    γ_l = Σ(x_t−μ)(x_{t+l}−μ)/n, var = γ₀ + 2Σ(1−l/6)γ_l, se = √(var/n) —
    versus the naive iid se √(γ₀/n). Output: event_type, n_days,
    mean_micro, se_naive_micro, se_nw_micro, ratio_micro. Types with
    var ≤ 0 or fewer than 7 days drop.

    Scale shape: bounded daily fold + one vectorized lag scan per type —
    no shuffle."""
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
        "event_type", "n_days", "mean_micro", "se_naive_micro",
        "se_nw_micro", "ratio_micro",
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
        x = sub["n"].to_numpy(np.float64)
        n = len(x)
        if n < _NW_LAGS + 2:
            continue
        mu = x.sum() / n
        xc = x - mu
        gam0 = float((xc * xc).sum()) / n
        var_nw = gam0
        for lag in range(1, _NW_LAGS + 1):
            g = float((xc[:-lag] * xc[lag:]).sum()) / n
            var_nw += 2.0 * (1.0 - lag / (_NW_LAGS + 1.0)) * g
        if gam0 <= 0.0 or var_nw <= 0.0:
            continue
        se_naive = np.sqrt(gam0 / n)
        se_nw = np.sqrt(var_nw / n)
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (et, np.int64(n), micro(mu), micro(se_naive), micro(se_nw),
             micro(se_nw / se_naive))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES203["events_newey_west"] = f"""
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n,
         avg(x) OVER (PARTITION BY event_type) AS mu
  FROM daily
),
gam AS (
  SELECT a.event_type, l.range AS lag,
         sum((a.x - a.mu) * (b.x - b.mu)) / any_value(a.n) AS g
  FROM idx a
  JOIN range(0, {_NW_LAGS + 1}) l ON true
  JOIN idx b ON b.event_type = a.event_type AND b.t = a.t + l.range
  WHERE a.n >= {_NW_LAGS + 2}
  GROUP BY 1, 2
),
v AS (
  SELECT event_type,
         max(CASE WHEN lag = 0 THEN g END) AS gam0,
         max(CASE WHEN lag = 0 THEN g END)
           + 2.0 * sum(CASE WHEN lag > 0
                            THEN (1.0 - lag / {_NW_LAGS + 1}.0) * g
                            ELSE 0.0 END) AS var_nw
  FROM gam GROUP BY 1
),
f AS (
  SELECT v.event_type, idx2.n, idx2.mu, v.gam0, v.var_nw
  FROM v JOIN (SELECT DISTINCT event_type, n, mu FROM idx) idx2
    ON v.event_type = idx2.event_type
  WHERE v.gam0 > 0.0 AND v.var_nw > 0.0
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(mu * 1000000.0 + 0.5) AS BIGINT) AS mean_micro,
       CAST(floor(sqrt(gam0 / n) * 1000000.0 + 0.5) AS BIGINT)
         AS se_naive_micro,
       CAST(floor(sqrt(var_nw / n) * 1000000.0 + 0.5) AS BIGINT)
         AS se_nw_micro,
       CAST(floor(sqrt(var_nw / n) / sqrt(gam0 / n) * 1000000.0 + 0.5)
            AS BIGINT) AS ratio_micro
FROM f ORDER BY event_type"""


QUERIES203 = {
    "events_bayes_ab": q_events_bayes_ab,
    "events_newey_west": q_events_newey_west,
}
