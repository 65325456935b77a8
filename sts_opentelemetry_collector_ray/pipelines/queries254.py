"""Driver-contract queries, wave 254 — Dunn's post-hoc pairwise rank test
(1964: the follow-up to wave 239's Kruskal-Wallis, tie-corrected pooled
rank variance + Bonferroni) and the XYZ demand-variability classification
(the forecasting-practice companion of wave 229's ABC classes) with
EXACT integer class boundaries (CV thresholds squared and cross-multiplied
so both engines compare integers, never floats).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries197 import _phi_upper, _phi_upper_sql

ORACLES254: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_dunn_posthoc — pairwise follow-up to Kruskal-Wallis
# ---------------------------------------------------------------------------


def q_events_dunn_posthoc(sf_dir: str):
    """Dunn's test for every event-type pair x < y over `value`: with the
    Kruskal-Wallis average ranks (ties shared) and the tie-corrected
    pooled variance σ² = N(N+1)/12 − Σ(t³−t)/(12(N−1)),
    z = (R̄_x − R̄_y)/√(σ²(1/n_x + 1/n_y)), p = 2·Φ̄(|z|) (shared A&S
    polynomial), Bonferroni-adjusted p_bonf = min(1, p·k(k−1)/2),
    rejected at 5%. Output per pair: x_type, y_type, n_x, n_y, z_micro,
    p_bonf_micro, reject_5pct.

    Scale shape: the wave-239 distinct-value count fold; the pair grid is
    k(k−1)/2 rows on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "value"]).to_pandas()
        return (
            df.groupby(["value", "event_type"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["x_type", "y_type", "n_x", "n_y", "z_micro", "p_bonf_micro",
            "reject_5pct"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c in ("x_type", "y_type")
                                 else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    vt = part.groupby(["value", "event_type"], as_index=False)["c"].sum()
    v = vt.groupby("value")["c"].sum().sort_index()
    tie = v.to_numpy(np.float64)
    n = float(tie.sum())
    if n < 2:
        return empty
    hi = np.cumsum(tie)
    avg_rank = hi - (tie - 1.0) / 2.0
    ranks = pd.Series(avg_rank, index=v.index)
    vt["rsum"] = ranks.reindex(vt["value"]).to_numpy(np.float64) * vt[
        "c"
    ].to_numpy(np.float64)
    g = (
        vt.groupby("event_type")
        .agg(nc=("c", "sum"), r=("rsum", "sum"))
        .sort_index()
    )
    k = len(g)
    if k < 2:
        return empty
    sigma2 = n * (n + 1.0) / 12.0 - float((tie ** 3 - tie).sum()) / (
        12.0 * (n - 1.0)
    )
    m = k * (k - 1) // 2
    types = g.index.to_list()
    nc = g["nc"].to_numpy(np.float64)
    rbar = g["r"].to_numpy(np.float64) / nc
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            se = math.sqrt(sigma2 * (1.0 / nc[i] + 1.0 / nc[j]))
            if se == 0.0:
                continue
            z = (rbar[i] - rbar[j]) / se
            p = 2.0 * float(_phi_upper(np.array([abs(z)]))[0])
            pb = min(1.0, p * m)
            rows.append(
                (types[i], types[j], np.int64(nc[i]), np.int64(nc[j]),
                 np.int64(np.floor(z * 1_000_000.0 + 0.5)),
                 np.int64(np.floor(pb * 1_000_000.0 + 0.5)),
                 np.int64(1 if pb < 0.05 else 0))
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )


_Z_EXPR = (
    "(gx.r / gx.nc - gy.r / gy.nc) / "
    "sqrt(s.sigma2 * (1.0 / gx.nc + 1.0 / gy.nc))"
)

ORACLES254["events_dunn_posthoc"] = f"""
WITH vt AS (
  SELECT value AS v, event_type, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
dv AS (SELECT v, sum(c) AS t FROM vt GROUP BY 1),
rk AS (
  SELECT v, t,
         sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (t - 1.0) / 2.0 AS avg_rank
  FROM dv
),
tot AS (SELECT sum(t) AS n, sum(t * t * t - t) AS ties FROM dv),
gr AS (
  SELECT vt.event_type, sum(vt.c) AS nc, sum(vt.c * rk.avg_rank) AS r
  FROM vt JOIN rk ON vt.v = rk.v GROUP BY 1
),
s AS (
  SELECT tot.n * (tot.n + 1.0) / 12.0
           - tot.ties / (12.0 * (tot.n - 1.0)) AS sigma2,
         (SELECT count(*) FROM gr) AS k
  FROM tot
),
pairs AS (
  SELECT gx.event_type AS x_type, gy.event_type AS y_type,
         CAST(gx.nc AS BIGINT) AS n_x, CAST(gy.nc AS BIGINT) AS n_y,
         {_Z_EXPR} AS z,
         s.k * (s.k - 1) // 2 AS m
  FROM gr gx JOIN gr gy ON gx.event_type < gy.event_type, s
  WHERE sqrt(s.sigma2 * (1.0 / gx.nc + 1.0 / gy.nc)) > 0.0
),
padj AS (
  SELECT x_type, y_type, n_x, n_y, z,
         least(1.0, 2.0 * {_phi_upper_sql('abs(z)')} * m) AS pb
  FROM pairs
)
SELECT x_type, y_type, n_x, n_y,
       CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
       CAST(floor(pb * 1000000.0 + 0.5) AS BIGINT) AS p_bonf_micro,
       CAST(CASE WHEN pb < 0.05 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM padj ORDER BY x_type, y_type"""


# ---------------------------------------------------------------------------
# parts_xyz_classes — demand-variability classification census
# ---------------------------------------------------------------------------


def q_parts_xyz_classes(sf_dir: str):
    """XYZ classification of parts by demand variability: per part, the
    coefficient of variation of MONTHLY shipped quantity over the global
    ship-month span (absent months count as zero demand) — with S = Σ
    demand, Q = Σ monthly-demand², M = span months, CV = √(MQ − S²)/S;
    classes by EXACT cross-multiplied boundaries X: 4MQ ≤ 5S²
    (CV ≤ 0.5), Y: MQ ≤ 2S² (CV ≤ 1), else Z. Output per class:
    xyz_class, n_parts, share_micro, avg_cv_micro.

    Scale shape: per-batch (part, month, qty) partials; per-part S/Q fold
    then a 3-row class census (at 100 TB the per-part fold rides a
    part-bucket exchange exactly like stages/dedup_docs.py)."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["l_partkey", "l_shipdate", "l_quantity"]).to_pandas()
        d = df["l_shipdate"].dt
        df["ym"] = (d.year * 12 + (d.month - 1)).astype(np.int64)
        return (
            df.groupby(["l_partkey", "ym"], sort=False, as_index=False)
            ["l_quantity"].sum()
            .rename(columns={"l_quantity": "d"})
        )

    part = (
        ray.data.read_parquet(
            path, columns=["l_partkey", "l_shipdate", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["xyz_class", "n_parts", "share_micro", "avg_cv_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "xyz_class" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    pm = part.groupby(["l_partkey", "ym"], as_index=False)["d"].sum()
    m_span = int(pm["ym"].max() - pm["ym"].min() + 1)
    d = pm["d"].to_numpy(np.float64)
    pm["q"] = d * d
    g = pm.groupby("l_partkey").agg(s=("d", "sum"), q=("q", "sum"))
    s = g["s"].to_numpy(np.float64)
    q = g["q"].to_numpy(np.float64)
    keep = s > 0.0
    s, q = s[keep], q[keep]
    mq = m_span * q
    s2 = s * s
    cls = np.where(4.0 * mq <= 5.0 * s2, "X",
                   np.where(mq <= 2.0 * s2, "Y", "Z"))
    cv = np.sqrt(np.maximum(mq - s2, 0.0)) / s
    df = pd.DataFrame({"xyz_class": cls, "cv": cv})
    total = len(df)
    out = (
        df.groupby("xyz_class")
        .agg(n_parts=("cv", "size"), cv_sum=("cv", "sum"))
        .reset_index()
        .sort_values("xyz_class")
    )
    out["share_micro"] = np.floor(
        out["n_parts"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["avg_cv_micro"] = np.floor(
        out["cv_sum"].to_numpy(np.float64)
        / out["n_parts"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out[cols].astype({"n_parts": np.int64}).reset_index(drop=True)


ORACLES254["parts_xyz_classes"] = """
WITH pm AS (
  SELECT l_partkey,
         CAST(year(l_shipdate) * 12 + (month(l_shipdate) - 1) AS BIGINT)
           AS ym,
         sum(l_quantity) AS d
  FROM lineitem GROUP BY 1, 2
),
span AS (SELECT CAST(max(ym) - min(ym) + 1 AS DOUBLE) AS m FROM pm),
per AS (
  SELECT l_partkey, sum(d) AS s, sum(d * d) AS q
  FROM pm GROUP BY 1 HAVING sum(d) > 0.0
),
cls AS (
  SELECT CASE WHEN 4.0 * span.m * per.q <= 5.0 * per.s * per.s THEN 'X'
              WHEN span.m * per.q <= 2.0 * per.s * per.s THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         sqrt(greatest(span.m * per.q - per.s * per.s, 0.0)) / per.s AS cv
  FROM per, span
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM cls)
SELECT xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(floor(count(*) / tot.total * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro,
       CAST(floor(sum(cv) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS avg_cv_micro
FROM cls, tot GROUP BY xyz_class, tot.total ORDER BY xyz_class"""


QUERIES254 = {
    "events_dunn_posthoc": q_events_dunn_posthoc,
    "parts_xyz_classes": q_parts_xyz_classes,
}
