"""Driver-contract queries, wave 244 — Friedman's blocked rank test (1937)
of event-type traffic across ISO-epoch weeks (blocks = weeks, treatments =
types) and the Brown-Forsythe (1974) median-based variance-homogeneity
test of event value across types.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES244: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_friedman — blocked rank test over (week, type) counts
# ---------------------------------------------------------------------------


def q_events_friedman(sf_dir: str):
    """Friedman χ² over the (epoch-week, event type) count matrix: only
    COMPLETE blocks (weeks where every type appears) enter; within each
    block, types get average ranks of their counts; χ²_F = 12/(bk(k+1))·
    Σ_j R_j² − 3b(k+1). One row: n_blocks, k, chi2_micro.

    Scale shape: bounded (week, type) fold; the rank matrix is |weeks|×k
    on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type"]).to_pandas()
        ts = pd.Series(t["ts"].to_numpy(zero_copy_only=False))
        df["week"] = (
            ts.values.astype("datetime64[D]").astype(np.int64) // 7
        ).astype(np.int64)
        return (
            df.groupby(["week", "event_type"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_blocks", "k", "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    ct = part.groupby(["week", "event_type"], as_index=False)["c"].sum()
    k = ct["event_type"].nunique()
    if k < 2:
        return empty
    sizes = ct.groupby("week")["event_type"].nunique()
    full = sizes[sizes == k].index
    ct = ct[ct["week"].isin(full)]
    b = len(full)
    if b < 2:
        return empty
    # average ranks within each week
    ct = ct.sort_values(["week", "c", "event_type"], kind="mergesort")
    ct["rk"] = ct.groupby("week")["c"].rank(method="average")
    r_j = ct.groupby("event_type")["rk"].sum().to_numpy(np.float64)
    chi2 = 12.0 / (b * k * (k + 1.0)) * float((r_j * r_j).sum()) - 3.0 * b * (
        k + 1.0
    )
    return pd.DataFrame(
        {"n_blocks": [np.int64(b)], "k": [np.int64(k)],
         "chi2_micro": [np.int64(np.floor(chi2 * 1_000_000.0 + 0.5))]}
    )


ORACLES244["events_friedman"] = """
WITH ct AS (
  SELECT CAST(floor(epoch(date_trunc('day', ts)) / 86400.0) AS BIGINT) // 7
           AS week,
         event_type, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM ct),
full_w AS (
  SELECT week FROM ct, kk GROUP BY week, kk.k
  HAVING count(DISTINCT event_type) = any_value(kk.k)
),
f AS (SELECT ct.* FROM ct JOIN full_w ON ct.week = full_w.week),
rk AS (
  SELECT event_type,
         rank() OVER (PARTITION BY week ORDER BY c)
           + (count(*) OVER (PARTITION BY week, c) - 1) / 2.0 AS rk
  FROM f
),
agg AS (
  SELECT event_type, sum(rk) AS r FROM rk GROUP BY 1
),
b AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM full_w)
SELECT CAST(b.b AS BIGINT) AS n_blocks, kk.k,
       CAST(floor((12.0 / (b.b * kk.k * (kk.k + 1.0)) * sum(agg.r * agg.r)
                   - 3.0 * b.b * (kk.k + 1.0)) * 1000000.0 + 0.5) AS BIGINT)
         AS chi2_micro
FROM agg, b, kk
GROUP BY b.b, kk.k
HAVING kk.k >= 2 AND b.b >= 2"""


# ---------------------------------------------------------------------------
# events_brown_forsythe — median-based homogeneity of value variance
# ---------------------------------------------------------------------------


def q_events_brown_forsythe(sf_dir: str):
    """Brown-Forsythe across event types over `value`: with z = |y −
    lower-median(type)|, F = ((N−k)/(k−1))·Σ n_j(z̄_j−z̄)² / Σ(z−z̄_j)²
    (types with < 2 rows drop). One row: n, k, f_micro.

    Scale shape: pass 1 folds per-type lower medians from a distinct-value
    count table; pass 2 folds (n, Σz, Σz²) per type — both bounded."""
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])

    def cnt_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return (
            df.groupby(["event_type", "value"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    vc = ds.map_batches(cnt_partial, batch_format="pyarrow").to_pandas()
    cols = ["n", "k", "f_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if vc.empty:
        return empty
    vc = vc.groupby(["event_type", "value"], as_index=False)["c"].sum()
    meds = {}
    for et, sub in vc.groupby("event_type"):
        sub = sub.sort_values("value", kind="mergesort")
        cw = sub["c"].cumsum().to_numpy(np.int64)
        n_t = int(cw[-1])
        if n_t < 2:
            continue
        pos = (n_t + 1) // 2
        meds[et] = float(
            sub["value"].to_numpy(np.float64)[np.searchsorted(cw, pos)]
        )

    def z_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df[df["event_type"].isin(meds)]
        if df.empty:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "s": pd.Series([], dtype=np.float64),
                 "ss": pd.Series([], dtype=np.float64)}
            )
        m = df["event_type"].map(meds).to_numpy(np.float64)
        z = np.abs(df["value"].to_numpy(np.float64) - m)
        df = df.assign(z=z, z2=z * z)
        g = df.groupby("event_type", sort=False).agg(
            n=("z", "size"), s=("z", "sum"), ss=("z2", "sum")
        )
        return g.reset_index().astype({"n": np.int64})

    zp = ds.map_batches(z_partial, batch_format="pyarrow").to_pandas()
    if zp.empty:
        return empty
    g = zp.groupby("event_type")[["n", "s", "ss"]].sum()
    n_j = g["n"].to_numpy(np.float64)
    s_j = g["s"].to_numpy(np.float64)
    ss_j = g["ss"].to_numpy(np.float64)
    k = len(g)
    n = float(n_j.sum())
    if k < 2 or n <= k:
        return empty
    zbar_j = s_j / n_j
    zbar = float(s_j.sum()) / n
    num = float((n_j * (zbar_j - zbar) ** 2).sum())
    den = float((ss_j - n_j * zbar_j * zbar_j).sum())
    if den <= 0.0:
        return empty
    f = (n - k) / (k - 1.0) * num / den
    return pd.DataFrame(
        {"n": [np.int64(n)], "k": [np.int64(k)],
         "f_micro": [np.int64(np.floor(f * 1_000_000.0 + 0.5))]}
    )


ORACLES244["events_brown_forsythe"] = """
WITH vc AS (
  SELECT event_type, value AS v, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
cw AS (
  SELECT event_type, v,
         sum(c) OVER (PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM vc
),
med AS (
  SELECT event_type, min(v) AS m
  FROM cw WHERE cum >= (n + 1) // 2 AND n >= 2 GROUP BY 1
),
z AS (
  SELECT e.event_type, abs(e.value - med.m) AS z
  FROM events e JOIN med ON e.event_type = med.event_type
),
g AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n, sum(z) AS s,
         sum(z * z) AS ss
  FROM z GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(n) AS n,
         sum(n * (s / n - (SELECT sum(s) FROM g) / (SELECT sum(n) FROM g))
               * (s / n - (SELECT sum(s) FROM g) / (SELECT sum(n) FROM g)))
           AS num,
         sum(ss - n * (s / n) * (s / n)) AS den
  FROM g
)
SELECT CAST(n AS BIGINT) AS n, k,
       CAST(floor((n - k) / (k - 1.0) * num / den * 1000000.0 + 0.5)
            AS BIGINT) AS f_micro
FROM agg WHERE k >= 2 AND n > k AND den > 0.0"""


QUERIES244 = {
    "events_friedman": q_events_friedman,
    "events_brown_forsythe": q_events_brown_forsythe,
}
