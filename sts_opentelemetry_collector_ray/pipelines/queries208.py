"""Driver-contract queries, wave 208 — GARCH(1,1) volatility filtering of
daily count log-returns (fixed parameters, recursive-CTE step-exact replay)
and a Bass diffusion-model fit over the user-adoption curve (scaled
quadratic OLS + closed-form (p, q, M) recovery).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES208: dict[str, str] = {}

_G_OMEGA, _G_ALPHA, _G_BETA = 0.00001, 0.1, 0.85


# ---------------------------------------------------------------------------
# events_garch_filter — GARCH(1,1) over daily log-returns
# ---------------------------------------------------------------------------


def q_events_garch_filter(sf_dir: str):
    """Per event type: GARCH(1,1) (Bollerslev 1986) filtered variance over
    daily count log-returns r_t = ln(n_t/n_{t−1}) with ω = 1e−5, α = 0.1,
    β = 0.85 and σ²₁ = mean(r²); σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1}. The
    SQL oracle replays the recursion step-exactly (recursive CTE). Output:
    event_type, n_returns, sigma_final_micro, sigma_max_micro.

    Scale shape: bounded daily fold; the recursion is sequential per type
    on driver arrays — no shuffle."""
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
    cols = ["event_type", "n_returns", "sigma_final_micro", "sigma_max_micro"]
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
        n = sub["n"].to_numpy(np.float64)
        if len(n) < 3:
            continue
        r = np.log(n[1:] / n[:-1])
        m = len(r)
        s2 = float((r * r).sum()) / m
        s2_max = s2
        for t in range(1, m):
            s2 = _G_OMEGA + _G_ALPHA * (r[t - 1] * r[t - 1]) + _G_BETA * s2
            s2_max = max(s2_max, s2)
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (et, np.int64(m), micro(np.sqrt(s2)), micro(np.sqrt(s2_max)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES208["events_garch_filter"] = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
ret AS (
  SELECT a.event_type, a.t - 1 AS rt, ln(a.n / b.n) AS r,
         count(*) OVER (PARTITION BY a.event_type) AS m
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND b.t = a.t - 1
),
init AS (
  SELECT event_type, any_value(m) AS m, sum(r * r) / any_value(m) AS s20
  FROM ret WHERE m >= 2 GROUP BY 1
),
g AS (
  SELECT init.event_type, 1 AS t, init.m, init.s20 AS s2, init.s20 AS s2max
  FROM init
  UNION ALL
  SELECT g.event_type, g.t + 1, g.m,
         {_G_OMEGA} + {_G_ALPHA} * (r.r * r.r) + {_G_BETA} * g.s2,
         greatest(g.s2max,
                  {_G_OMEGA} + {_G_ALPHA} * (r.r * r.r) + {_G_BETA} * g.s2)
  FROM g JOIN ret r ON r.event_type = g.event_type AND r.rt = g.t
  WHERE g.t < g.m
)
SELECT event_type, CAST(m AS BIGINT) AS n_returns,
       CAST(floor(sqrt(s2) * 1000000.0 + 0.5) AS BIGINT) AS sigma_final_micro,
       CAST(floor(sqrt(s2max) * 1000000.0 + 0.5) AS BIGINT) AS sigma_max_micro
FROM g WHERE t = m ORDER BY event_type"""


# ---------------------------------------------------------------------------
# events_bass_diffusion — Bass model fit on the adoption curve
# ---------------------------------------------------------------------------


def q_events_bass_diffusion(sf_dir: str):
    """Bass diffusion fit (Bass 1969, discrete OLS form): HOURLY new users
    S_t regressed on u = N_{t−1}/K and u² (K = total adopters; centered
    2×2 OLS), then (p, q, M) recovered from a = pM, b/K = q−p, c/K² =
    −q/M via the quadratic root M = (−b̂−√(b̂²−4aĉ))/(2ĉ) (−1 sentinels
    when the root is undefined). Output one row: n_days, a_micro, b_micro,
    c_micro, m_est, p_micro, q_micro.

    Scale shape: first-seen hour per user derives inside ONE user-bucket
    exchange; the bounded hourly adoption series fits on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id", "ts"]).to_pandas()
        hour = (
            df["ts"].astype("datetime64[us]").to_numpy("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        df["hour"] = hour
        g = df.groupby("user_id", sort=False, as_index=False)["hour"].min()
        g["_b"] = (g["user_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return g

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False)["hour"].min()
        out = pd.DataFrame({"hour": u["hour"].to_numpy(np.int64), "s": 1})
        return out.groupby("hour", as_index=False).sum().astype(np.int64)

    part = (
        ray.data.read_parquet(path, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n_days", "a_micro", "b_micro", "c_micro", "m_est", "p_micro", "q_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    hourly = part.groupby("hour")["s"].sum().sort_index()
    s = hourly.to_numpy(np.float64)
    if len(s) < 4:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    kk = float(s.sum())
    n_prev = np.concatenate([[0.0], np.cumsum(s)[:-1]])
    u = n_prev / kk
    y = s
    n = float(len(y))
    x1, x2 = u, u * u
    s1, s2, sy = x1.sum(), x2.sum(), y.sum()
    s11, s22, s12 = (x1 * x1).sum(), (x2 * x2).sum(), (x1 * x2).sum()
    s1y, s2y = (x1 * y).sum(), (x2 * y).sum()
    s11c = s11 - s1 * s1 / n
    s22c = s22 - s2 * s2 / n
    s12c = s12 - s1 * s2 / n
    s1yc = s1y - s1 * sy / n
    s2yc = s2y - s2 * sy / n
    det = s11c * s22c - s12c * s12c
    if det == 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    b1 = (s1yc * s22c - s2yc * s12c) / det
    b2 = (s2yc * s11c - s1yc * s12c) / det
    a = sy / n - b1 * (s1 / n) - b2 * (s2 / n)
    bb = b1 / kk
    cc = b2 / (kk * kk)
    disc = bb * bb - 4.0 * a * cc
    if disc >= 0.0 and cc < 0.0:
        m_root = (-bb - np.sqrt(disc)) / (2.0 * cc)
        if m_root > 0.0:
            p = a / m_root
            q = -cc * m_root
            m_est = np.int64(np.floor(m_root + 0.5))
            p_mu = np.int64(np.floor(p * 1_000_000.0 + 0.5))
            q_mu = np.int64(np.floor(q * 1_000_000.0 + 0.5))
        else:
            m_est, p_mu, q_mu = np.int64(-1), np.int64(-1), np.int64(-1)
    else:
        m_est, p_mu, q_mu = np.int64(-1), np.int64(-1), np.int64(-1)
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "a_micro": [micro(a)],
            "b_micro": [micro(b1)],
            "c_micro": [micro(b2)],
            "m_est": [m_est],
            "p_micro": [p_mu],
            "q_micro": [q_mu],
        }
    )


ORACLES208["events_bass_diffusion"] = """
WITH fs AS (
  SELECT user_id,
         min(epoch_us(ts) // 3600000000) AS hr
  FROM events GROUP BY 1
),
daily AS (SELECT hr, CAST(count(*) AS DOUBLE) AS s FROM fs GROUP BY 1),
idx AS (
  SELECT hr, s,
         coalesce(sum(s) OVER (ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
           AS n_prev,
         sum(s) OVER () AS kk,
         count(*) OVER () AS nd
  FROM daily
),
pts AS (
  SELECT s AS y, n_prev / kk AS x1,
         (n_prev / kk) * (n_prev / kk) AS x2, kk, nd
  FROM idx WHERE nd >= 4
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, any_value(kk) AS kk,
         sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
  FROM pts
),
c AS (
  SELECT n, kk, s1, s2, sy,
         s11 - s1 * s1 / n AS s11c, s22 - s2 * s2 / n AS s22c,
         s12 - s1 * s2 / n AS s12c, s1y - s1 * sy / n AS s1yc,
         s2y - s2 * sy / n AS s2yc
  FROM m
),
b AS (
  SELECT n, kk, s1, s2, sy,
         (s1yc * s22c - s2yc * s12c) / (s11c * s22c - s12c * s12c) AS b1,
         (s2yc * s11c - s1yc * s12c) / (s11c * s22c - s12c * s12c) AS b2
  FROM c WHERE s11c * s22c - s12c * s12c <> 0.0
),
f AS (
  SELECT n, b1, b2,
         sy / n - b1 * (s1 / n) - b2 * (s2 / n) AS a,
         b1 / kk AS bb, b2 / (kk * kk) AS cc
  FROM b
),
g AS (
  SELECT n, a, b1, b2, bb, cc, bb * bb - 4.0 * a * cc AS disc,
         CASE WHEN bb * bb - 4.0 * a * cc >= 0.0 AND cc < 0.0
              THEN (-bb - sqrt(bb * bb - 4.0 * a * cc)) / (2.0 * cc)
              ELSE NULL END AS m_root
  FROM f
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(floor(a * 1000000.0 + 0.5) AS BIGINT) AS a_micro,
       CAST(floor(b1 * 1000000.0 + 0.5) AS BIGINT) AS b_micro,
       CAST(floor(b2 * 1000000.0 + 0.5) AS BIGINT) AS c_micro,
       CAST(CASE WHEN m_root IS NOT NULL AND m_root > 0.0
                 THEN floor(m_root + 0.5) ELSE -1 END AS BIGINT) AS m_est,
       CAST(CASE WHEN m_root IS NOT NULL AND m_root > 0.0
                 THEN floor(a / m_root * 1000000.0 + 0.5)
                 ELSE -1 END AS BIGINT) AS p_micro,
       CAST(CASE WHEN m_root IS NOT NULL AND m_root > 0.0
                 THEN floor(-cc * m_root * 1000000.0 + 0.5)
                 ELSE -1 END AS BIGINT) AS q_micro
FROM g"""


QUERIES208 = {
    "events_garch_filter": q_events_garch_filter,
    "events_bass_diffusion": q_events_bass_diffusion,
}
