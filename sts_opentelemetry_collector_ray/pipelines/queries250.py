"""Driver-contract queries, wave 250 — the Jonckheere-Terpstra ordered
trend test (1954) of quantity across ordered discount bands and the
Hyndman seasonal-strength decomposition of the daily total series
(centered 7-day MA trend, day-of-week seasonal, F_s = 1 − Var R/Var(S+R)).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES250: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_jonckheere — ordered-alternative trend across discount bands
# ---------------------------------------------------------------------------


def q_lineitem_jonckheere(sf_dir: str):
    """Jonckheere-Terpstra over ordered discount bands with y = quantity:
    JT = Σ_{i<j} [#(x_i < x_j) + ½·#(x_i = x_j)] from the (band, qty)
    count grid; z = (JT − E)/√Var with the no-ties moments E = (N² −
    Σn_i²)/4, Var = (N²(2N+3) − Σn_i²(2n_i+3))/72 (tie correction
    deliberately omitted — documented normal approximation). One row:
    n, n_bands, jt_int, e_int, z_micro.

    Scale shape: the (band, qty) grid fold is 11×50; the pair algebra is
    a cumulative-sum scan on the driver."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["band"] = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        df["q"] = np.floor(
            df["l_quantity"].to_numpy(np.float64) + 0.5
        ).astype(np.int64)
        return (
            df.groupby(["band", "q"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["l_discount", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "n_bands", "jt_int", "e_int", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    grid = (
        part.groupby(["band", "q"])["c"].sum().unstack("q", fill_value=0)
    ).sort_index()
    k = len(grid)
    if k < 2:
        return empty
    m = grid.to_numpy(np.float64)  # bands × qty, qty columns sorted
    m = m[:, np.argsort(grid.columns.to_numpy())]
    # suffix band mass per qty: rows j > i
    suffix = np.vstack([m[i + 1:].sum(axis=0) for i in range(k)])
    # for x in band i at qty q: greater = suffix mass at qty' > q
    gt = np.cumsum(suffix[:, ::-1], axis=1)[:, ::-1]
    gt = np.concatenate([gt[:, 1:], np.zeros((k, 1))], axis=1)
    jt = float((m * gt).sum()) + 0.5 * float((m * suffix).sum())
    n_i = m.sum(axis=1)
    n = float(n_i.sum())
    e = (n * n - float((n_i * n_i).sum())) / 4.0
    var = (
        n * n * (2.0 * n + 3.0)
        - float((n_i * n_i * (2.0 * n_i + 3.0)).sum())
    ) / 72.0
    if var <= 0.0:
        return empty
    z = (jt - e) / np.sqrt(var)
    return pd.DataFrame(
        {"n": [np.int64(n)], "n_bands": [np.int64(k)],
         "jt_int": [np.int64(np.floor(jt + 0.5))],
         "e_int": [np.int64(np.floor(e + 0.5))],
         "z_micro": [np.int64(np.floor(z * 1_000_000.0 + 0.5))]}
    )


ORACLES250["lineitem_jonckheere"] = """
WITH g AS (
  SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS band,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(count(*) AS DOUBLE) AS c
  FROM lineitem GROUP BY 1, 2
),
jt AS (
  SELECT sum(CASE WHEN a.q < b.q THEN a.c * b.c
                  WHEN a.q = b.q THEN 0.5 * a.c * b.c
                  ELSE 0 END) AS jt
  FROM g a JOIN g b ON b.band > a.band
),
ni AS (SELECT band, sum(c) AS n FROM g GROUP BY 1),
mom AS (
  SELECT sum(n) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(n * n) AS s2, sum(n * n * (2.0 * n + 3.0)) AS s3
  FROM ni
),
f AS (
  SELECT jt.jt, mom.n, mom.k,
         (mom.n * mom.n - mom.s2) / 4.0 AS e,
         (mom.n * mom.n * (2.0 * mom.n + 3.0) - mom.s3) / 72.0 AS var
  FROM jt, mom
)
SELECT CAST(n AS BIGINT) AS n, k AS n_bands,
       CAST(floor(jt + 0.5) AS BIGINT) AS jt_int,
       CAST(floor(e + 0.5) AS BIGINT) AS e_int,
       CAST(floor((jt - e) / sqrt(var) * 1000000.0 + 0.5) AS BIGINT)
         AS z_micro
FROM f WHERE k >= 2 AND var > 0.0"""


# ---------------------------------------------------------------------------
# events_seasonal_strength — MA-detrended day-of-week seasonality
# ---------------------------------------------------------------------------


def q_events_seasonal_strength(sf_dir: str):
    """Seasonal-strength F_s (Hyndman & Athanasopoulos) of TOTAL daily
    counts: trend = centered 7-day MA (only days with a full window),
    detrended d = y − trend, seasonal = per-ISO-dow mean of d, remainder
    r = d − seasonal, F_s = max(0, 1 − Var r / Var d) (population
    variances over the valid days). One row: n_days, n_valid, fs_micro,
    trend_strength_micro (same construction against Var(y−seasonal)).

    Scale shape: bounded daily fold; windows are vectorized convolutions
    on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["n_days", "n_valid", "fs_micro", "trend_strength_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    tot = daily.groupby("day")["n"].sum().sort_index()
    y = tot.to_numpy(np.float64)
    days = tot.index.to_numpy(np.int64)
    n = len(y)
    if n < 15:
        return empty
    trend = np.convolve(y, np.ones(7) / 7.0, mode="valid")  # n-6 values
    valid = slice(3, n - 3)
    yv = y[valid]
    dv = yv - trend
    # ISO dow of the valid days (day key is yyyymmdd)
    dts = pd.to_datetime(
        pd.Series(days[valid]).astype(str), format="%Y%m%d"
    )
    dow = dts.dt.dayofweek.to_numpy(np.int64)
    seas = np.zeros(7)
    for d in range(7):
        m = dow == d
        if m.any():
            seas[d] = dv[m].sum() / m.sum()
    s = seas[dow]
    r = dv - s
    var = lambda a: float(((a - a.sum() / len(a)) ** 2).sum()) / len(a)  # noqa: E731
    vd = var(dv)
    vr = var(r)
    vy_s = var(yv - s)
    fs = max(0.0, 1.0 - vr / vd) if vd > 0.0 else 0.0
    ft = max(0.0, 1.0 - vr / vy_s) if vy_s > 0.0 else 0.0
    return pd.DataFrame(
        {"n_days": [np.int64(n)], "n_valid": [np.int64(len(yv))],
         "fs_micro": [np.int64(np.floor(fs * 1_000_000.0 + 0.5))],
         "trend_strength_micro": [
             np.int64(np.floor(ft * 1_000_000.0 + 0.5))
         ]}
    )


ORACLES250["events_seasonal_strength"] = """
WITH daily AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         date_trunc('day', min(ts)) AS dts,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, dts, y, row_number() OVER (ORDER BY day) - 1 AS t,
         count(*) OVER () AS n
  FROM daily
),
tr AS (
  SELECT t, dts, y, n,
         avg(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend,
         count(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS w
  FROM idx
),
v AS (
  SELECT t, y - trend AS d, y,
         CAST(dayofweek(dts) AS BIGINT) AS dow, n
  FROM tr WHERE w = 7 AND n >= 15
),
seas AS (SELECT dow, avg(d) AS s FROM v GROUP BY 1),
j AS (
  SELECT v.t, v.d, v.d - seas.s AS r, v.y - seas.s AS ys, v.n
  FROM v JOIN seas ON v.dow = seas.dow
),
m AS (
  SELECT any_value(n) AS n, CAST(count(*) AS BIGINT) AS nv,
         avg(d * d) - avg(d) * avg(d) AS vd,
         avg(r * r) - avg(r) * avg(r) AS vr,
         avg(ys * ys) - avg(ys) * avg(ys) AS vys
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_days, nv AS n_valid,
       CAST(floor(greatest(CASE WHEN vd > 0.0 THEN 1.0 - vr / vd
                                ELSE 0.0 END, 0.0) * 1000000.0 + 0.5)
            AS BIGINT) AS fs_micro,
       CAST(floor(greatest(CASE WHEN vys > 0.0 THEN 1.0 - vr / vys
                                ELSE 0.0 END, 0.0) * 1000000.0 + 0.5)
            AS BIGINT) AS trend_strength_micro
FROM m"""


QUERIES250 = {
    "lineitem_jonckheere": q_lineitem_jonckheere,
    "events_seasonal_strength": q_events_seasonal_strength,
}
