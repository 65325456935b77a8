"""Driver-contract queries, wave 360 — hourly rhythm autocorrelation at
the daily (24) and weekly (168) lags, and volume-vs-value seasonality
alignment of orders across calendar months. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES360: dict[str, str] = {}

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# events_hourly_rhythm_acf — ACF at lags 24 and 168 of the hourly series
# ---------------------------------------------------------------------------


def q_events_hourly_rhythm_acf(sf_dir: str):
    """Rhythm strength at hourly resolution: the biased ACF (global
    mean) of the zero-filled hourly series at lag 24 (daily rhythm) and
    lag 168 (weekly rhythm) — EXACT integer moment cores, two float
    compositions. One row: n_hours, r24_micro, r168_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hr = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        h = pd.Series(hr).groupby(hr).size()
        return pd.DataFrame(
            {"hr": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hours = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")["c"]
        .sum()
    )
    cols = ["n_hours", "r24_micro", "r168_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hours.empty:
        return empty
    h0, h1 = int(hours.index.min()), int(hours.index.max())
    n = h1 - h0 + 1
    if n < 200:
        return empty
    y = np.zeros(n, np.int64)
    y[hours.index.to_numpy(np.int64) - h0] = hours.to_numpy(np.int64)
    yo = y.astype(object)
    s = int(yo.sum())
    s2 = int((yo * yo).sum())
    c0 = n * s2 - s * s
    if c0 <= 0:
        return empty

    def acf(k: int) -> float:
        a, b = yo[:-k], yo[k:]
        m = n - k
        sab = int((a * b).sum())
        sa, sb = int(a.sum()), int(b.sum())
        num = n * n * sab - n * s * (sa + sb) + m * s * s
        return float(num) / float(n) / float(c0)

    r24 = acf(24)
    r168 = acf(168)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(r24 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(r168 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES360["events_hourly_rhythm_acf"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  SELECT g.h0 + CAST(r.range AS BIGINT) AS hr,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 500000) r
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (hr)
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
l24 AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS sab,
         CAST(sum(a.y) AS BIGINT) AS sa, CAST(sum(b.y) AS BIGINT) AS sb
  FROM x a JOIN x b ON b.t = a.t + 24
),
l168 AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS sab,
         CAST(sum(a.y) AS BIGINT) AS sa, CAST(sum(b.y) AS BIGINT) AS sb
  FROM x a JOIN x b ON b.t = a.t + 168
),
r AS (
  SELECT nn.n,
         CAST(CAST(nn.n AS HUGEINT) * nn.n * a.sab
              - CAST(nn.n AS HUGEINT) * nn.s * (a.sa + a.sb)
              + CAST(a.m AS HUGEINT) * nn.s * nn.s AS DOUBLE)
           / nn.n
           / CAST(CAST(nn.n AS HUGEINT) * nn.s2
                  - CAST(nn.s AS HUGEINT) * nn.s AS DOUBLE) AS r24,
         CAST(CAST(nn.n AS HUGEINT) * nn.n * b.sab
              - CAST(nn.n AS HUGEINT) * nn.s * (b.sa + b.sb)
              + CAST(b.m AS HUGEINT) * nn.s * nn.s AS DOUBLE)
           / nn.n
           / CAST(CAST(nn.n AS HUGEINT) * nn.s2
                  - CAST(nn.s AS HUGEINT) * nn.s AS DOUBLE) AS r168
  FROM nn, l24 a, l168 b
  WHERE nn.n >= 200
    AND (CAST(nn.n AS HUGEINT) * nn.s2 - CAST(nn.s AS HUGEINT) * nn.s) > 0
)
SELECT n AS n_hours,
       CAST(floor(r24 * 1000000.0 + 0.5) AS BIGINT) AS r24_micro,
       CAST(floor(r168 * 1000000.0 + 0.5) AS BIGINT) AS r168_micro
FROM r"""


# ---------------------------------------------------------------------------
# orders_volume_value_seasonality — do volume and value peak together?
# ---------------------------------------------------------------------------


def q_orders_volume_value_seasonality(sf_dir: str):
    """Seasonality alignment: per calendar month-of-year (1..12) the
    order count and total cents; peak months of each (max, earliest
    tie) and the Spearman correlation between the two 12-point
    profiles (doubled average ranks, exact integer core). One row:
    peak_month_volume, peak_month_value, spearman_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        moy = df["o_orderdate"].dt.month.to_numpy(np.int64)
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame({"m": moy, "n": 1, "s": cents}).groupby(
            "m", as_index=False
        ).sum()
        return g.astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("m")[["n", "s"]]
        .sum()
    )
    cols = ["peak_month_volume", "peak_month_value", "spearman_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(m) < 3:
        return empty
    months = sorted(m.index)
    n_v = np.array([int(m["n"].loc[mm]) for mm in months], np.int64)
    s_v = np.array([int(m["s"].loc[mm]) for mm in months], np.int64)
    pk_n = int(months[int(np.argmax(n_v))])
    pk_s = int(months[int(np.argmax(s_v))])

    def r2(v: np.ndarray) -> np.ndarray:
        vals, cnts = np.unique(v, return_counts=True)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        r2v = 2 * below + cnts + 1
        return r2v[np.searchsorted(vals, v)]

    ra, rb = r2(n_v).astype(object), r2(s_v).astype(object)
    k = len(months)
    sx, sy = int(ra.sum()), int(rb.sum())
    sxx = int((ra * ra).sum())
    syy = int((rb * rb).sum())
    sxy = int((ra * rb).sum())
    cx = k * sxx - sx * sx
    cy = k * syy - sy * sy
    if cx <= 0 or cy <= 0:
        return empty
    rho = float(k * sxy - sx * sy) / (
        float(np.sqrt(float(cx))) * float(np.sqrt(float(cy)))
    )
    return pd.DataFrame(
        [
            (
                np.int64(pk_n), np.int64(pk_s),
                np.int64(np.floor(rho * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES360["orders_volume_value_seasonality"] = """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS moy,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM orders GROUP BY 1
),
pkn AS (SELECT moy FROM m ORDER BY n DESC, moy LIMIT 1),
pks AS (SELECT moy FROM m ORDER BY s DESC, moy LIMIT 1),
r AS (
  SELECT moy,
         2 * (rank() OVER (ORDER BY n)) + (count(*) OVER (PARTITION BY n))
           - 1 AS ra,
         2 * (rank() OVER (ORDER BY s)) + (count(*) OVER (PARTITION BY s))
           - 1 AS rb
  FROM m
),
mm AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(ra) AS BIGINT) AS sx, CAST(sum(rb) AS BIGINT) AS sy,
         CAST(sum(CAST(ra AS HUGEINT) * ra) AS HUGEINT) AS sxx,
         CAST(sum(CAST(rb AS HUGEINT) * rb) AS HUGEINT) AS syy,
         CAST(sum(CAST(ra AS HUGEINT) * rb) AS HUGEINT) AS sxy
  FROM r
)
SELECT pkn.moy AS peak_month_volume, pks.moy AS peak_month_value,
       CAST(floor(CAST(CAST(k AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(k AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * sqrt(CAST(CAST(k AS HUGEINT) * syy
                                 - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS spearman_micro
FROM mm, pkn, pks
WHERE k >= 3
  AND (CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
  AND (CAST(k AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0"""


QUERIES360 = {
    "events_hourly_rhythm_acf": q_events_hourly_rhythm_acf,
    "orders_volume_value_seasonality": q_orders_volume_value_seasonality,
}
