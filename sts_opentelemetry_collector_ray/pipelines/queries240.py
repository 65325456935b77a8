"""Driver-contract queries, wave 240 — Ljung-Box portmanteau test (lags
1..7) of the total daily event count series (Ljung & Box 1978) and the
Jarque-Bera normality test of order totals per priority (Jarque & Bera
1980; two-pass centered moments — raw fourth moments of 1e5-scale values
would cancel catastrophically).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES240: dict[str, str] = {}

_LB_MAX_LAG = 7
_JB_CRIT = 5.991464547107979  # chi2(2) at 5%


# ---------------------------------------------------------------------------
# events_ljung_box — portmanteau autocorrelation test, lags 1..7
# ---------------------------------------------------------------------------


def q_events_ljung_box(sf_dir: str):
    """Over the TOTAL daily count series (mean-centered): the lag-k sample
    autocorrelation r_k = Σ_{t>k} e_t·e_{t−k} / Σ e_t² and the cumulative
    Ljung-Box Q(k) = n(n+2)·Σ_{j≤k} r_j²/(n−j) for k = 1..7. Output one
    row per lag: lag, n_days, acf_micro, q_micro.

    Scale shape: bounded daily fold; lags are vectorized slices on the
    driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["lag", "n_days", "acf_micro", "q_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    tot = daily.groupby("day")["n"].sum().sort_index()
    y = tot.to_numpy(np.float64)
    n = len(y)
    if n <= _LB_MAX_LAG + 1:
        return empty
    e = y - y.sum() / n
    den = float((e * e).sum())
    if den <= 0.0:
        return empty
    rows = []
    q = 0.0
    for k in range(1, _LB_MAX_LAG + 1):
        r = float((e[k:] * e[:-k]).sum()) / den
        q += r * r / (n - k)
        qk = n * (n + 2.0) * q
        rows.append(
            (np.int64(k), np.int64(n),
             np.int64(np.floor(r * 1_000_000.0 + 0.5)),
             np.int64(np.floor(qk * 1_000_000.0 + 0.5)))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES240["events_ljung_box"] = f"""
WITH daily AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT y, row_number() OVER (ORDER BY day) - 1 AS t,
         count(*) OVER () AS n, avg(y) OVER () AS m
  FROM daily
),
e AS (SELECT t, y - m AS e, n FROM idx),
den AS (SELECT sum(e * e) AS d, any_value(n) AS n FROM e),
lags AS (SELECT unnest(range(1, {_LB_MAX_LAG + 1})) AS k),
acf AS (
  SELECT lags.k, sum(a.e * b.e) / den.d AS r, den.n
  FROM lags
  JOIN e a ON TRUE
  JOIN e b ON b.t = a.t - lags.k, den
  WHERE den.n > {_LB_MAX_LAG + 1} AND den.d > 0.0
  GROUP BY lags.k, den.d, den.n
),
q AS (
  SELECT k, n, r,
         n * (n + 2.0) * sum(r * r / (n - k)) OVER (ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qk
  FROM acf
)
SELECT CAST(k AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
       CAST(floor(r * 1000000.0 + 0.5) AS BIGINT) AS acf_micro,
       CAST(floor(qk * 1000000.0 + 0.5) AS BIGINT) AS q_micro
FROM q ORDER BY k"""


# ---------------------------------------------------------------------------
# orders_jarque_bera — JB normality of order totals per priority
# ---------------------------------------------------------------------------


def q_orders_jarque_bera(sf_dir: str):
    """Per order priority: Jarque-Bera over o_totalprice — skewness
    S = m₃/m₂^1.5, excess kurtosis K = m₄/m₂² − 3 from CENTERED moments
    (two passes: means first, then per-batch centered partials),
    JB = n/6·(S² + K²/4), rejected at the 5% χ²(2) bound 5.9915.
    Output: o_orderpriority, n, skew_micro, exkurt_micro, jb_micro,
    reject_5pct.

    Scale shape: pass 1 folds (priority, n, Σx); pass 2 folds centered
    (Σe², Σe³, Σe⁴) partials against the broadcast means — both bounded
    by |priorities|."""
    path = f"{sf_dir}/orders.parquet"
    ds = ray.data.read_parquet(
        path, columns=["o_orderpriority", "o_totalprice"]
    )

    def mean_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("o_orderpriority", sort=False)["o_totalprice"].agg(
            ["sum", "size"]
        )
        return g.reset_index().rename(columns={"sum": "s", "size": "c"})

    mp = ds.map_batches(mean_partial, batch_format="pyarrow").to_pandas()
    cols = ["o_orderpriority", "n", "skew_micro", "exkurt_micro",
            "jb_micro", "reject_5pct"]
    if mp.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "o_orderpriority"
                                     else np.int64))
             for c in cols}
        )
    mg = mp.groupby("o_orderpriority").agg(s=("s", "sum"), c=("c", "sum"))
    means = (mg["s"] / mg["c"]).to_dict()

    def mom_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["m"] = df["o_orderpriority"].map(means)
        e = df["o_totalprice"].to_numpy(np.float64) - df["m"].to_numpy(
            np.float64
        )
        df["e2"] = e * e
        df["e3"] = df["e2"].to_numpy(np.float64) * e
        df["e4"] = df["e2"].to_numpy(np.float64) * df["e2"].to_numpy(
            np.float64
        )
        return (
            df.groupby("o_orderpriority", sort=False, as_index=False)[
                ["e2", "e3", "e4"]
            ].sum()
        )

    pp = ds.map_batches(mom_partial, batch_format="pyarrow").to_pandas()
    g = pp.groupby("o_orderpriority").sum().join(mg).sort_index()
    n = g["c"].to_numpy(np.float64)
    keep = n >= 4
    g, n = g[keep], n[keep]
    m2 = g["e2"].to_numpy(np.float64) / n
    m3 = g["e3"].to_numpy(np.float64) / n
    m4 = g["e4"].to_numpy(np.float64) / n
    s = m3 / m2 ** 1.5
    k = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (s * s + k * k / 4.0)
    return pd.DataFrame(
        {
            "o_orderpriority": np.asarray(g.index.to_numpy(object)),
            "n": n.astype(np.int64),
            "skew_micro": np.floor(s * 1_000_000.0 + 0.5).astype(np.int64),
            "exkurt_micro": np.floor(k * 1_000_000.0 + 0.5).astype(np.int64),
            "jb_micro": np.floor(jb * 1_000_000.0 + 0.5).astype(np.int64),
            "reject_5pct": (jb > _JB_CRIT).astype(np.int64),
        }
    )


ORACLES240["orders_jarque_bera"] = f"""
WITH mu AS (
  SELECT o_orderpriority, avg(o_totalprice) AS m,
         CAST(count(*) AS DOUBLE) AS n
  FROM orders GROUP BY 1 HAVING count(*) >= 4
),
mom AS (
  SELECT o.o_orderpriority, any_value(mu.n) AS n,
         sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m)) AS e2,
         sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m)
             * (o.o_totalprice - mu.m)) AS e3,
         sum((o.o_totalprice - mu.m) * (o.o_totalprice - mu.m)
             * (o.o_totalprice - mu.m) * (o.o_totalprice - mu.m)) AS e4
  FROM orders o JOIN mu ON o.o_orderpriority = mu.o_orderpriority
  GROUP BY 1
),
f AS (
  SELECT o_orderpriority, n,
         (e3 / n) / pow(e2 / n, 1.5) AS s,
         (e4 / n) / ((e2 / n) * (e2 / n)) - 3.0 AS k
  FROM mom
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS skew_micro,
       CAST(floor(k * 1000000.0 + 0.5) AS BIGINT) AS exkurt_micro,
       CAST(floor(n / 6.0 * (s * s + k * k / 4.0) * 1000000.0 + 0.5)
            AS BIGINT) AS jb_micro,
       CAST(CASE WHEN n / 6.0 * (s * s + k * k / 4.0) > {_JB_CRIT}
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM f ORDER BY o_orderpriority"""


QUERIES240 = {
    "events_ljung_box": q_events_ljung_box,
    "orders_jarque_bera": q_orders_jarque_bera,
}
