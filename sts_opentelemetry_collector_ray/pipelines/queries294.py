"""Driver-contract queries, wave 294 — the distribution-free
order-statistic confidence interval for the median of order totals
(binomial rank bounds, exact histogram order statistics) and Lotka's
law: the log-log power fit of the user-productivity frequency spectrum.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES294: dict[str, str] = {}

_Z95 = 1.959963984540054
_LK_BUCKETS = 64


# ---------------------------------------------------------------------------
# orders_median_ci — distribution-free CI via binomial order statistics
# ---------------------------------------------------------------------------


def q_orders_median_ci(sf_dir: str):
    """Distribution-free 95% CI for the median order total: rank bounds
    l = max(1, floor((n - z sqrt(n)) / 2)) and
    u = min(n, ceil((n + 2 + z sqrt(n)) / 2)) from the normal
    approximation to Binomial(n, 1/2); the interval is
    [x_(l), x_(u)] — order statistics read EXACTLY off the cents
    histogram, no resampling anywhere. One row: n, med_cents, lo_cents,
    hi_cents.

    Scale shape: bounded cents-histogram combiner (the
    `orders_lorenz_curve` idiom); rank lookups are prefix-sum
    searches."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n", "med_cents", "lo_cents", "hi_cents"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    if n < 2:
        return empty
    cum = np.cumsum(c)

    def order_stat(k: int) -> int:
        k = min(max(k, 1), n)
        return int(y[int(np.searchsorted(cum, k, side="left"))])

    zs = _Z95 * float(np.sqrt(float(n)))
    lo_rank = int(np.floor((float(n) - zs) / 2.0))
    hi_rank = int(np.ceil((float(n) + 2.0 + zs) / 2.0))
    med = order_stat((n + 1) // 2)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(med),
                np.int64(order_stat(lo_rank)),
                np.int64(order_stat(hi_rank)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES294["orders_median_ci"] = f"""
WITH b AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders
),
h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
cum AS (SELECT y, sum(c) OVER (ORDER BY y) AS cc FROM h),
rk AS (
  SELECT nn.n,
         least(greatest(CAST(floor((CAST(nn.n AS DOUBLE)
                 - {_Z95} * sqrt(CAST(nn.n AS DOUBLE))) / 2.0) AS BIGINT),
               1), nn.n) AS lo_rank,
         least(greatest(CAST(ceil((CAST(nn.n AS DOUBLE) + 2.0
                 + {_Z95} * sqrt(CAST(nn.n AS DOUBLE))) / 2.0) AS BIGINT),
               1), nn.n) AS hi_rank,
         (nn.n + 1) // 2 AS med_rank
  FROM nn
)
SELECT rk.n,
       (SELECT min(y) FROM cum WHERE cc >= rk.med_rank) AS med_cents,
       (SELECT min(y) FROM cum WHERE cc >= rk.lo_rank) AS lo_cents,
       (SELECT min(y) FROM cum WHERE cc >= rk.hi_rank) AS hi_cents
FROM rk
WHERE rk.n >= 2"""


# ---------------------------------------------------------------------------
# users_lotka — power-law fit of the productivity spectrum
# ---------------------------------------------------------------------------


def q_users_lotka(sf_dir: str):
    """Lotka's law: the number of users with k events follows
    V_k ~ C k^-alpha; fit by OLS on (ln k, ln V_k) over the nonzero
    spectrum. The spectrum is EXACT integer counting (the
    `users_nb_vs_poisson` bucketed histogram); logs/OLS are the float
    steps. One row: n_points, alpha_micro, intercept_milli, r2_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        out = pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "k": g.to_numpy(np.int64)}
        )
        out["_b"] = (out["u"] % _LK_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")["k"].sum()
        h = per.groupby(per.values).size()
        return pd.DataFrame(
            {"k": h.index.to_numpy(np.int64), "v": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("k")["v"]
        .sum()
        .sort_index()
    )
    cols = ["n_points", "alpha_micro", "intercept_milli", "r2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(hist) < 3:
        return empty
    x = np.log(hist.index.to_numpy(np.int64).astype(np.float64))
    yv = np.log(hist.to_numpy(np.int64).astype(np.float64))
    n = float(len(hist))
    sx, sy = float(x.sum()), float(yv.sum())
    sxx, sxy = float((x * x).sum()), float((x * yv).sum())
    syy = float((yv * yv).sum())
    den = n * sxx - sx * sx
    if den == 0.0:
        return empty
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    den_y = n * syy - sy * sy
    if den_y <= 0.0:
        return empty
    r = (n * sxy - sx * sy) / float(np.sqrt(den * den_y))
    return pd.DataFrame(
        [
            (
                np.int64(int(n)),
                np.int64(np.floor(-slope * 1_000_000.0 + 0.5)),
                np.int64(np.floor(intercept * 1_000.0 + 0.5)),
                np.int64(np.floor(r * r * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES294["users_lotka"] = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1
),
h AS (SELECT k, CAST(count(*) AS BIGINT) AS v FROM per GROUP BY 1),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(ln(CAST(k AS DOUBLE))) AS sx,
         sum(ln(CAST(v AS DOUBLE))) AS sy,
         sum(ln(CAST(k AS DOUBLE)) * ln(CAST(k AS DOUBLE))) AS sxx,
         sum(ln(CAST(k AS DOUBLE)) * ln(CAST(v AS DOUBLE))) AS sxy,
         sum(ln(CAST(v AS DOUBLE)) * ln(CAST(v AS DOUBLE))) AS syy
  FROM h
),
fit AS (
  SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS intercept,
         (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
  FROM m
  WHERE n >= 3 AND (n * sxx - sx * sx) <> 0 AND (n * syy - sy * sy) > 0
)
SELECT n AS n_points,
       CAST(floor(-slope * 1000000.0 + 0.5) AS BIGINT) AS alpha_micro,
       CAST(floor(intercept * 1000.0 + 0.5) AS BIGINT) AS intercept_milli,
       CAST(floor(r * r * 1000000.0 + 0.5) AS BIGINT) AS r2_micro
FROM fit"""


QUERIES294 = {
    "orders_median_ci": q_orders_median_ci,
    "users_lotka": q_users_lotka,
}
