"""Driver-contract queries, wave 228 — Atkinson inequality indices of order
values (ε = 0.5 and ε = 2) and a Weibull probability-plot regression fit of
customer reorder gaps (grid ECDF → ln(−ln(1−F)) ~ ln t OLS).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES228: dict[str, str] = {}

_WB_GRID = 100


# ---------------------------------------------------------------------------
# orders_atkinson_index — Atkinson inequality at eps 0.5 and 2
# ---------------------------------------------------------------------------


def q_orders_atkinson_index(sf_dir: str):
    """Atkinson (1970) inequality of order values: A(½) = 1 −
    (Σ√x/n)²/μ and A(2) = 1 − (n/Σ(1/x))/μ (harmonic over arithmetic
    mean). One row: n, mean_micro, atkinson_half_micro, atkinson_two_micro.

    Scale shape: one (n, Σx, Σ√x, Σ1/x) combiner; driver folds blocks —
    no shuffle."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        v = np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
        v = v[v > 0.0]
        return pd.DataFrame(
            {"n": [np.int64(len(v))], "s": [v.sum()],
             "sq": [np.sqrt(v).sum()], "inv": [(1.0 / v).sum()]}
        )

    part = (
        ray.data.read_parquet(path, columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "mean_micro", "atkinson_half_micro", "atkinson_two_micro"]
    if part.empty or part["n"].sum() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = float(part["n"].sum())
    mu = float(part["s"].sum()) / n
    ede_half = (float(part["sq"].sum()) / n) ** 2
    ede_two = n / float(part["inv"].sum())
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "mean_micro": [micro(mu)],
            "atkinson_half_micro": [micro(1.0 - ede_half / mu)],
            "atkinson_two_micro": [micro(1.0 - ede_two / mu)],
        }
    )


ORACLES228["orders_atkinson_index"] = """
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(o_totalprice) AS s,
         sum(sqrt(o_totalprice)) AS sq, sum(1.0 / o_totalprice) AS inv
  FROM orders WHERE o_totalprice > 0.0 HAVING count(*) > 0
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(s / n * 1000000.0 + 0.5) AS BIGINT) AS mean_micro,
       CAST(floor((1.0 - (sq / n) * (sq / n) / (s / n)) * 1000000.0 + 0.5)
            AS BIGINT) AS atkinson_half_micro,
       CAST(floor((1.0 - (n / inv) / (s / n)) * 1000000.0 + 0.5) AS BIGINT)
         AS atkinson_two_micro
FROM s"""


# ---------------------------------------------------------------------------
# orders_weibull_plot_fit — probability-plot fit of reorder gaps
# ---------------------------------------------------------------------------


def q_orders_weibull_plot_fit(sf_dir: str):
    """Weibull probability-plot regression over customer reorder gaps
    (days between consecutive orders of the same customer): on a 100-point
    grid g_j = j·(mean gap)/25, the points (ln g_j, ln(−ln(1−F_j))) for
    0 < F_j < 1 fit by OLS — slope = shape k̂, scale λ̂ = exp(−intercept/k̂).
    One row: n_gaps, shape_micro, scale_micro, r2_micro.

    Scale shape: gaps derive inside ONE customer-bucket exchange; pass 1
    folds (n, Σgap), pass 2 folds the 100-bin grid histogram; the 2-column
    OLS runs on the driver."""
    path = f"{sf_dir}/orders.parquet"

    def bucketed(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey", "o_orderdate"]).to_pandas()
        df["_b"] = (df["o_custkey"].to_numpy(np.int64) % 64).astype(np.int32)
        return df

    def gaps_frame(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        ck = d["o_custkey"].to_numpy(np.int64)
        ts = (
            d["o_orderdate"].astype("datetime64[us]")
            .to_numpy("datetime64[us]").astype(np.int64)
        )
        same = np.zeros(len(d), dtype=bool)
        same[1:] = ck[1:] == ck[:-1]
        gap = np.empty(len(d), np.float64)
        gap[1:] = (ts[1:] - ts[:-1]) / 86_400_000_000.0
        gk = gap[same]
        gk = gk[gk > 0.0]
        return pd.DataFrame({"gap": gk})

    gaps = (
        ray.data.read_parquet(path, columns=["o_custkey", "o_orderdate"])
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(gaps_frame, batch_format="pandas")
        .materialize()
    )

    def sum_partial(t: pa.Table) -> pd.DataFrame:
        v = np.asarray(t["gap"].to_numpy(zero_copy_only=False), np.float64)
        return pd.DataFrame({"n": [np.int64(len(v))], "s": [v.sum()]})

    sp = gaps.map_batches(sum_partial, batch_format="pyarrow").to_pandas()
    cols = ["n_gaps", "shape_micro", "scale_micro", "r2_micro"]
    n_g = int(sp["n"].sum()) if not sp.empty else 0
    if n_g < 10:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    mean = float(sp["s"].sum()) / n_g
    step = mean / 25.0

    def grid_partial(t: pa.Table) -> pd.DataFrame:
        v = np.asarray(t["gap"].to_numpy(zero_copy_only=False), np.float64)
        idx = np.minimum(np.floor(v / step), float(_WB_GRID)).astype(np.int64)
        df = pd.DataFrame({"idx": idx, "n": 1})
        return df.groupby("idx", as_index=False).sum().astype(np.int64)

    gp = gaps.map_batches(grid_partial, batch_format="pyarrow").to_pandas()
    h = np.zeros(_WB_GRID + 1, np.int64)
    hh = gp.groupby("idx")["n"].sum()
    h[np.minimum(hh.index.to_numpy(np.int64), _WB_GRID)] += hh.to_numpy(np.int64)
    cum = np.cumsum(h)[:_WB_GRID]  # #gaps < j*step for j=1..100
    j = np.arange(1, _WB_GRID + 1, dtype=np.float64)
    f = cum.astype(np.float64) / n_g
    keep = (f > 0.0) & (f < 1.0)
    if keep.sum() < 3:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    x = np.log(j[keep] * step)
    y = np.log(-np.log(1.0 - f[keep]))
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    sxx = (x * x).sum()
    sxy = (x * y).sum()
    syy = (y * y).sum()
    sxx_c = sxx - sx * sx / n
    sxy_c = sxy - sx * sy / n
    syy_c = syy - sy * sy / n
    if sxx_c <= 0.0 or syy_c <= 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    k = sxy_c / sxx_c
    a = sy / n - k * (sx / n)
    lam = np.exp(-a / k)
    r2 = (sxy_c * sxy_c) / (sxx_c * syy_c)
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n_gaps": [np.int64(n_g)],
            "shape_micro": [micro(k)],
            "scale_micro": [micro(lam)],
            "r2_micro": [micro(r2)],
        }
    )


ORACLES228["orders_weibull_plot_fit"] = f"""
WITH s AS (
  SELECT o_custkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
           AS prev
  FROM orders
),
gaps AS (
  SELECT date_diff('microsecond', prev, o_orderdate) / 86400000000.0 AS gap
  FROM s WHERE prev IS NOT NULL
    AND date_diff('microsecond', prev, o_orderdate) > 0
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(gap) / count(*) AS mean
  FROM gaps HAVING count(*) >= 10
),
grid AS (
  SELECT st.n, st.mean / 25.0 AS step, CAST(u.range AS BIGINT) AS j
  FROM st, range(1, {_WB_GRID + 1}) u
),
cnt AS (
  SELECT grid.j, grid.n, grid.step,
         (SELECT count(*) FROM gaps WHERE gaps.gap < grid.j * grid.step)
           AS c
  FROM grid
),
pts AS (
  SELECT ln(j * step) AS x,
         ln(-ln(1.0 - CAST(c AS DOUBLE) / n)) AS y,
         n AS n_gaps
  FROM cnt WHERE c > 0 AND c < n
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, any_value(n_gaps) AS n_gaps,
         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
         sum(x * y) AS sxy, sum(y * y) AS syy
  FROM pts HAVING count(*) >= 3
),
f AS (
  SELECT n_gaps, n, sx, sy,
         sxx - sx * sx / n AS sxxc, sxy - sx * sy / n AS sxyc,
         syy - sy * sy / n AS syyc
  FROM m
)
SELECT CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST(floor(sxyc / sxxc * 1000000.0 + 0.5) AS BIGINT) AS shape_micro,
       CAST(floor(exp(-(sy / n - (sxyc / sxxc) * (sx / n)) / (sxyc / sxxc))
                  * 1000000.0 + 0.5) AS BIGINT) AS scale_micro,
       CAST(floor((sxyc * sxyc) / (sxxc * syyc) * 1000000.0 + 0.5) AS BIGINT)
         AS r2_micro
FROM f WHERE sxxc > 0.0 AND syyc > 0.0"""


QUERIES228 = {
    "orders_atkinson_index": q_orders_atkinson_index,
    "orders_weibull_plot_fit": q_orders_weibull_plot_fit,
}
