"""Driver-contract queries, wave 224 — circular statistics of event
time-of-day (mean direction, resultant length, Rayleigh test) and the
within/between panel decomposition of the retail-price ~ size slope across
brands. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES224: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_circular_stats — directional statistics of time-of-day
# ---------------------------------------------------------------------------


def q_events_circular_stats(sf_dir: str):
    """Per event type: map time-of-day to the circle θ = 2π·sec/86400;
    mean direction atan2(Σsin, Σcos), resultant length R = ‖(C,S)‖/n,
    circular variance 1−R and the Rayleigh statistic z = nR² (Mardia &
    Jupp 2000). Output: event_type, n, mean_dir_micro, r_micro,
    rayleigh_z_micro.

    Scale shape: one (type, Σcos, Σsin, n) combiner; driver folds
    |types|×blocks rows — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        sec = (
            d.hour.to_numpy(np.int64) * 3600
            + d.minute.to_numpy(np.int64) * 60
            + d.second.to_numpy(np.int64)
        ).astype(np.float64)
        theta = 2.0 * np.pi * sec / 86400.0
        df["c"] = np.cos(theta)
        df["s"] = np.sin(theta)
        df["n"] = 1
        return df.groupby("event_type", sort=False, as_index=False)[
            ["c", "s", "n"]
        ].sum().astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n", "mean_dir_micro", "r_micro", "rayleigh_z_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
             for c in cols}
        )
    g = part.groupby("event_type")[["c", "s", "n"]].sum().sort_index()
    n = g["n"].to_numpy(np.float64)
    cc = g["c"].to_numpy(np.float64)
    ss = g["s"].to_numpy(np.float64)
    r = np.sqrt(cc * cc + ss * ss) / n
    mean_dir = np.arctan2(ss, cc)
    z = n * r * r
    micro = lambda a: np.floor(np.asarray(a) * 1_000_000.0 + 0.5).astype(np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "event_type": np.asarray(g.index.to_numpy(object)),
            "n": g["n"].to_numpy(np.int64),
            "mean_dir_micro": micro(mean_dir),
            "r_micro": micro(r),
            "rayleigh_z_micro": micro(z),
        }
    )


ORACLES224["events_circular_stats"] = """
WITH t AS (
  SELECT event_type,
         2.0 * pi() * (hour(ts) * 3600 + minute(ts) * 60
                       + CAST(floor(second(ts)) AS BIGINT)) / 86400.0
           AS theta
  FROM events
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(cos(theta)) AS c, sum(sin(theta)) AS s
  FROM t GROUP BY 1
)
SELECT event_type, n,
       CAST(floor(atan2(s, c) * 1000000.0 + 0.5) AS BIGINT) AS mean_dir_micro,
       CAST(floor(sqrt(c * c + s * s) / n * 1000000.0 + 0.5) AS BIGINT)
         AS r_micro,
       CAST(floor(n * (sqrt(c * c + s * s) / n) * (sqrt(c * c + s * s) / n)
                  * 1000000.0 + 0.5) AS BIGINT) AS rayleigh_z_micro
FROM g ORDER BY event_type"""


# ---------------------------------------------------------------------------
# part_hedonic_within — within/between slope decomposition across brands
# ---------------------------------------------------------------------------


def q_part_hedonic_within(sf_dir: str):
    """Panel decomposition of the retailprice ~ size slope with brand
    groups: the WITHIN (fixed-effects) slope Σ_b Sxy_c(b)/Σ_b Sxx_c(b),
    the BETWEEN slope over brand means (count-weighted) and the pooled
    OLS slope. One row: n_parts, n_brands, slope_within_micro,
    slope_between_micro, slope_pooled_micro.

    Scale shape: one (brand, n, Σx, Σy, Σxy, Σx²) combiner; the scalar
    algebra runs on the driver — no shuffle."""
    path = f"{sf_dir}/part.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["p_brand", "p_size", "p_retailprice"]).to_pandas()
        x = df["p_size"].to_numpy(np.float64)
        y = df["p_retailprice"].to_numpy(np.float64)
        out = pd.DataFrame(
            {"brand": df["p_brand"].to_numpy(object), "n": 1, "sx": x,
             "sy": y, "sxy": x * y, "sxx": x * x}
        )
        return out.groupby("brand", sort=False, as_index=False).sum().astype(
            {"n": np.int64}
        )

    part = (
        ray.data.read_parquet(
            path, columns=["p_brand", "p_size", "p_retailprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "n_parts", "n_brands", "slope_within_micro", "slope_between_micro",
        "slope_pooled_micro",
    ]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby("brand").sum()
    n_i = g["n"].to_numpy(np.float64)
    sx = g["sx"].to_numpy(np.float64)
    sy = g["sy"].to_numpy(np.float64)
    sxy = g["sxy"].to_numpy(np.float64)
    sxx = g["sxx"].to_numpy(np.float64)
    # within: sum of per-brand centered moments
    w_xy = (sxy - sx * sy / n_i).sum()
    w_xx = (sxx - sx * sx / n_i).sum()
    # between: count-weighted regression of brand means
    n_tot = n_i.sum()
    mx = sx / n_i
    my = sy / n_i
    gx = sx.sum() / n_tot
    gy = sy.sum() / n_tot
    b_xy = (n_i * (mx - gx) * (my - gy)).sum()
    b_xx = (n_i * (mx - gx) * (mx - gx)).sum()
    # pooled
    p_xy = sxy.sum() - sx.sum() * sy.sum() / n_tot
    p_xx = sxx.sum() - sx.sum() * sx.sum() / n_tot
    if w_xx <= 0.0 or b_xx <= 0.0 or p_xx <= 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n_parts": [np.int64(n_tot)],
            "n_brands": [np.int64(len(g))],
            "slope_within_micro": [micro(w_xy / w_xx)],
            "slope_between_micro": [micro(b_xy / b_xx)],
            "slope_pooled_micro": [micro(p_xy / p_xx)],
        }
    )


ORACLES224["part_hedonic_within"] = """
WITH b AS (
  SELECT p_brand, count(*) AS n,
         sum(CAST(p_size AS DOUBLE)) AS sx, sum(p_retailprice) AS sy,
         sum(CAST(p_size AS DOUBLE) * p_retailprice) AS sxy,
         sum(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)) AS sxx
  FROM part GROUP BY 1
),
agg AS (
  SELECT sum(n) AS nt, count(*) AS nb,
         sum(sxy - sx * sy / n) AS w_xy,
         sum(sxx - sx * sx / n) AS w_xx,
         sum(sx) AS tsx, sum(sy) AS tsy,
         sum(sxy) AS tsxy, sum(sxx) AS tsxx
  FROM b
),
bt AS (
  SELECT sum(b.n * (b.sx / b.n - agg.tsx / agg.nt)
             * (b.sy / b.n - agg.tsy / agg.nt)) AS b_xy,
         sum(b.n * (b.sx / b.n - agg.tsx / agg.nt)
             * (b.sx / b.n - agg.tsx / agg.nt)) AS b_xx
  FROM b, agg
)
SELECT CAST(agg.nt AS BIGINT) AS n_parts,
       CAST(agg.nb AS BIGINT) AS n_brands,
       CAST(floor(agg.w_xy / agg.w_xx * 1000000.0 + 0.5) AS BIGINT)
         AS slope_within_micro,
       CAST(floor(bt.b_xy / bt.b_xx * 1000000.0 + 0.5) AS BIGINT)
         AS slope_between_micro,
       CAST(floor((agg.tsxy - agg.tsx * agg.tsy / agg.nt)
                  / (agg.tsxx - agg.tsx * agg.tsx / agg.nt)
                  * 1000000.0 + 0.5) AS BIGINT) AS slope_pooled_micro
FROM agg, bt
WHERE agg.w_xx > 0.0 AND bt.b_xx > 0.0
  AND agg.tsxx - agg.tsx * agg.tsx / agg.nt > 0.0"""


QUERIES224 = {
    "events_circular_stats": q_events_circular_stats,
    "part_hedonic_within": q_part_hedonic_within,
}
