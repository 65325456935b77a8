"""Driver-contract queries, wave 186 — extreme-value tail modelling
(peaks-over-threshold GPD fit by method of moments per event type) and a
Neyman-allocation stratified sampling design over event-type strata.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES186: dict[str, str] = {}


def _micro(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1_000_000.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# events_pot_gpd — peaks-over-threshold generalized Pareto tail fit
# ---------------------------------------------------------------------------


def q_events_pot_gpd(sf_dir: str):
    """Per event type: moment threshold u = mean + 2σ, exceedance count and a
    method-of-moments GPD fit over the excesses x = value − u
    (ξ = ½(1 − m²/s²), β = ½m(m²/s² + 1); Hosking & Wallis 1987). Types with
    fewer than 2 exceedances or zero excess variance are dropped.

    Scale shape: two single-pass bounded combiners over events — (type, n,
    Σv, Σv²) partials fold to |types| rows, thresholds broadcast into the
    second pass via a sorted-key searchsorted array; no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "value"]).to_pandas()
        v = df["value"].to_numpy(np.float64)
        df["s"] = v
        df["s2"] = v * v
        g = df.groupby("event_type", sort=False).agg(
            n=("s", "size"), s=("s", "sum"), s2=("s2", "sum")
        )
        return g.reset_index().astype({"n": np.int64})

    ds = ray.data.read_parquet(path, columns=["event_type", "value"])
    stp = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_exceed": pd.Series([], dtype=np.int64),
            "u_micro": pd.Series([], dtype=np.int64),
            "xi_micro": pd.Series([], dtype=np.int64),
            "beta_micro": pd.Series([], dtype=np.int64),
        }
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

    def excess_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "value"]).to_pandas()
        et = df["event_type"].to_numpy(object)
        uu = tu[np.searchsorted(tkeys, et)]
        x = df["value"].to_numpy(np.float64) - uu
        keep = x > 0.0
        sub = pd.DataFrame({"event_type": et[keep], "x": x[keep]})
        sub["x2"] = sub["x"].to_numpy() ** 2
        g = sub.groupby("event_type", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sxx=("x2", "sum")
        )
        return g.reset_index().astype({"n": np.int64})

    exp_ = ds.map_batches(excess_partial, batch_format="pyarrow").to_pandas()
    if exp_.empty:
        return empty
    ex = exp_.groupby("event_type").sum()
    n = ex["n"].to_numpy(np.float64)
    m = ex["sx"].to_numpy(np.float64) / n
    s2 = ex["sxx"].to_numpy(np.float64) / n - m * m
    keep = (ex["n"].to_numpy(np.int64) >= 2) & (s2 > 0.0)
    r = m[keep] * m[keep] / s2[keep]
    xi = 0.5 * (1.0 - r)
    beta = 0.5 * m[keep] * (r + 1.0)
    et_keep = np.asarray(ex.index.to_numpy(object))[keep]
    uk = tu[np.searchsorted(tkeys, et_keep)]
    out = pd.DataFrame(
        {
            "event_type": et_keep,
            "n_exceed": ex["n"].to_numpy(np.int64)[keep],
            "u_micro": _micro(uk),
            "xi_micro": _micro(xi),
            "beta_micro": _micro(beta),
        }
    ).sort_values("event_type", kind="mergesort")
    return out.reset_index(drop=True)


ORACLES186["events_pot_gpd"] = """
WITH st AS (
  SELECT event_type, count(*) AS n, sum(value) AS s, sum(value * value) AS s2
  FROM events GROUP BY 1
),
u AS (
  SELECT event_type,
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
  FROM ex GROUP BY 1
),
f AS (
  SELECT m.event_type, m.n,
         u.u,
         sx / m.n AS mm,
         sxx / m.n - (sx / m.n) * (sx / m.n) AS s2v
  FROM m JOIN u ON m.event_type = u.event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_exceed,
       CAST(floor(u * 1000000.0 + 0.5) AS BIGINT) AS u_micro,
       CAST(floor(0.5 * (1.0 - mm * mm / s2v) * 1000000.0 + 0.5) AS BIGINT)
         AS xi_micro,
       CAST(floor(0.5 * mm * (mm * mm / s2v + 1.0) * 1000000.0 + 0.5) AS BIGINT)
         AS beta_micro
FROM f WHERE n >= 2 AND s2v > 0.0 ORDER BY event_type"""


# ---------------------------------------------------------------------------
# events_neyman_allocation — optimal stratified-sample allocation
# ---------------------------------------------------------------------------


def q_events_neyman_allocation(sf_dir: str):
    """Stratified sampling design over event-type strata for a 10 000-row
    budget: per stratum the size N_h, population σ_h (micro), the Neyman
    allocation n_h = round(B·N_hσ_h / ΣN_kσ_k) (Neyman 1934) and the
    proportional allocation round(B·N_h/N) for comparison.

    Scale shape: one single-pass bounded combiner (type, n, Σv, Σv²);
    driver folds |types| rows — no shuffle."""
    path = f"{sf_dir}/events.parquet"
    budget = 10_000.0

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "value"]).to_pandas()
        v = df["value"].to_numpy(np.float64)
        df["s"] = v
        df["s2"] = v * v
        g = df.groupby("event_type", sort=False).agg(
            n=("s", "size"), s=("s", "sum"), s2=("s2", "sum")
        )
        return g.reset_index().astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_h": pd.Series([], dtype=np.int64),
            "sigma_micro": pd.Series([], dtype=np.int64),
            "neyman_alloc": pd.Series([], dtype=np.int64),
            "prop_alloc": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    st = part.groupby("event_type").sum().sort_index()
    n = st["n"].to_numpy(np.float64)
    mean = st["s"].to_numpy(np.float64) / n
    sig = np.sqrt(np.maximum(st["s2"].to_numpy(np.float64) / n - mean * mean, 0.0))
    w = n * sig
    tot_w = float(w.sum())
    tot_n = float(n.sum())
    return pd.DataFrame(
        {
            "event_type": np.asarray(st.index.to_numpy(object)),
            "n_h": st["n"].to_numpy(np.int64),
            "sigma_micro": _micro(sig),
            "neyman_alloc": np.floor(budget * n * sig / tot_w + 0.5).astype(np.int64),
            "prop_alloc": np.floor(budget * n / tot_n + 0.5).astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES186["events_neyman_allocation"] = """
WITH st AS (
  SELECT event_type, count(*) AS n,
         sqrt(greatest(sum(value * value) / count(*)
              - (sum(value) / count(*)) * (sum(value) / count(*)), 0.0)) AS sig
  FROM events GROUP BY 1
),
tot AS (SELECT sum(n * sig) AS tw, sum(n) AS tn FROM st)
SELECT event_type,
       CAST(n AS BIGINT) AS n_h,
       CAST(floor(sig * 1000000.0 + 0.5) AS BIGINT) AS sigma_micro,
       CAST(floor(10000.0 * n * sig / tw + 0.5) AS BIGINT) AS neyman_alloc,
       CAST(floor(10000.0 * n / tn + 0.5) AS BIGINT) AS prop_alloc
FROM st, tot ORDER BY event_type"""


QUERIES186 = {
    "events_pot_gpd": q_events_pot_gpd,
    "events_neyman_allocation": q_events_neyman_allocation,
}
