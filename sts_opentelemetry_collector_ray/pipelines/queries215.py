"""Driver-contract queries, wave 215 — weekly harmonic regression of daily
counts (OLS on cos/sin regressors, amplitude + phase + R²) and intraclass
correlation of order values within customers (one-way ANOVA ICC(1),
unbalanced-group k̄). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES215: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_harmonic_regression — weekly cos/sin OLS per type
# ---------------------------------------------------------------------------


def q_events_harmonic_regression(sf_dir: str):
    """Per event type: OLS of daily counts on the weekly harmonic
    x₁ = cos(2πd/7), x₂ = sin(2πd/7) (d = epoch day; centered 2×2 normal
    equations). Output: event_type, n_days, amp_micro (√(b₁²+b₂²)),
    phase_micro (atan2(b₂, b₁)), r2_micro.

    Scale shape: bounded daily fold; the 2×2 system solves on the
    driver — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        day = (df["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
        df["day"] = day.to_numpy(np.int64)
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
    cols = ["event_type", "n_days", "amp_micro", "phase_micro", "r2_micro"]
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
        y = sub["n"].to_numpy(np.float64)
        d = sub["day"].to_numpy(np.float64)
        n = float(len(y))
        if n < 4:
            continue
        x1 = np.cos(2.0 * np.pi * d / 7.0)
        x2 = np.sin(2.0 * np.pi * d / 7.0)
        s1, s2, sy = x1.sum(), x2.sum(), y.sum()
        s11, s22, s12 = (x1 * x1).sum(), (x2 * x2).sum(), (x1 * x2).sum()
        s1y, s2y, syy = (x1 * y).sum(), (x2 * y).sum(), (y * y).sum()
        s11c = s11 - s1 * s1 / n
        s22c = s22 - s2 * s2 / n
        s12c = s12 - s1 * s2 / n
        s1yc = s1y - s1 * sy / n
        s2yc = s2y - s2 * sy / n
        syyc = syy - sy * sy / n
        det = s11c * s22c - s12c * s12c
        if det == 0.0 or syyc <= 0.0:
            continue
        b1 = (s1yc * s22c - s2yc * s12c) / det
        b2 = (s2yc * s11c - s1yc * s12c) / det
        sse = syyc - b1 * s1yc - b2 * s2yc
        r2 = 1.0 - sse / syyc
        amp = np.sqrt(b1 * b1 + b2 * b2)
        phase = np.arctan2(b2, b1)
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (et, np.int64(n), micro(amp), micro(phase), micro(r2))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES215["events_harmonic_regression"] = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS DOUBLE) AS d,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pts AS (
  SELECT event_type, y,
         cos(2.0 * pi() * d / 7.0) AS x1,
         sin(2.0 * pi() * d / 7.0) AS x2
  FROM daily
),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
  FROM pts GROUP BY 1 HAVING count(*) >= 4
),
c AS (
  SELECT event_type, n,
         s11 - s1 * s1 / n AS s11c, s22 - s2 * s2 / n AS s22c,
         s12 - s1 * s2 / n AS s12c, s1y - s1 * sy / n AS s1yc,
         s2y - s2 * sy / n AS s2yc, syy - sy * sy / n AS syyc
  FROM m
),
b AS (
  SELECT event_type, n, s1yc, s2yc, syyc,
         (s1yc * s22c - s2yc * s12c) / (s11c * s22c - s12c * s12c) AS b1,
         (s2yc * s11c - s1yc * s12c) / (s11c * s22c - s12c * s12c) AS b2
  FROM c WHERE s11c * s22c - s12c * s12c <> 0.0 AND syyc > 0.0
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(sqrt(b1 * b1 + b2 * b2) * 1000000.0 + 0.5) AS BIGINT)
         AS amp_micro,
       CAST(floor(atan2(b2, b1) * 1000000.0 + 0.5) AS BIGINT) AS phase_micro,
       CAST(floor((1.0 - (syyc - b1 * s1yc - b2 * s2yc) / syyc)
                  * 1000000.0 + 0.5) AS BIGINT) AS r2_micro
FROM b ORDER BY event_type"""


# ---------------------------------------------------------------------------
# orders_icc — intraclass correlation of order values within customers
# ---------------------------------------------------------------------------


def q_orders_icc(sf_dir: str):
    """ICC(1) (one-way random-effects ANOVA, unbalanced): groups =
    customers, values = order totals. MSB = Σnᵢ(mᵢ−m̄)²/(k−1), MSW =
    SSW/(N−k), k̄ = (N − Σnᵢ²/N)/(k−1), ICC = (MSB−MSW)/(MSB+(k̄−1)MSW).
    Customers with ≥ 2 orders only. One row: n_groups, n_orders, msb_kilo,
    msw_kilo, icc_micro.

    Scale shape: per-customer (n, Σv, Σv²) moments fold via a combiner
    (customer is dimension-bounded); the scalar ANOVA runs on the driver."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey", "o_totalprice"]).to_pandas()
        v = df["o_totalprice"].to_numpy(np.float64)
        df["s"] = v
        df["s2"] = v * v
        return df.groupby("o_custkey", sort=False, as_index=False).agg(
            n=("s", "size"), s=("s", "sum"), s2=("s2", "sum")
        ).astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_groups", "n_orders", "msb_kilo", "msw_kilo", "icc_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby("o_custkey").sum()
    g = g[g["n"] >= 2]
    k = len(g)
    if k < 2:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n_i = g["n"].to_numpy(np.float64)
    s_i = g["s"].to_numpy(np.float64)
    q_i = g["s2"].to_numpy(np.float64)
    n_tot = float(n_i.sum())
    m_bar = float(s_i.sum()) / n_tot
    m_i = s_i / n_i
    ssb = float((n_i * (m_i - m_bar) * (m_i - m_bar)).sum())
    ssw = float((q_i - s_i * s_i / n_i).sum())
    msb = ssb / (k - 1.0)
    msw = ssw / (n_tot - k)
    kbar = (n_tot - float((n_i * n_i).sum()) / n_tot) / (k - 1.0)
    icc = (msb - msw) / (msb + (kbar - 1.0) * msw)
    return pd.DataFrame(
        {
            "n_groups": [np.int64(k)],
            "n_orders": [np.int64(n_tot)],
            "msb_kilo": [np.int64(np.floor(msb / 1000.0 + 0.5))],
            "msw_kilo": [np.int64(np.floor(msw / 1000.0 + 0.5))],
            "icc_micro": [np.int64(np.floor(icc * 1_000_000.0 + 0.5))],
        }
    )


ORACLES215["orders_icc"] = """
WITH c AS (
  SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS s,
         sum(o_totalprice * o_totalprice) AS s2
  FROM orders GROUP BY 1 HAVING count(*) >= 2
),
t AS (
  SELECT CAST(count(*) AS DOUBLE) AS k,
         CAST(sum(n) AS DOUBLE) AS nt,
         sum(s) AS st,
         sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS sn2
  FROM c HAVING count(*) >= 2
),
ss AS (
  SELECT t.k, t.nt, t.sn2,
         sum(n * (s / n - t.st / t.nt) * (s / n - t.st / t.nt)) AS ssb,
         sum(s2 - s * s / n) AS ssw
  FROM c, t GROUP BY 1, 2, 3
),
f AS (
  SELECT k, nt,
         ssb / (k - 1.0) AS msb,
         ssw / (nt - k) AS msw,
         (nt - sn2 / nt) / (k - 1.0) AS kbar
  FROM ss
)
SELECT CAST(k AS BIGINT) AS n_groups,
       CAST(nt AS BIGINT) AS n_orders,
       CAST(floor(msb / 1000.0 + 0.5) AS BIGINT) AS msb_kilo,
       CAST(floor(msw / 1000.0 + 0.5) AS BIGINT) AS msw_kilo,
       CAST(floor((msb - msw) / (msb + (kbar - 1.0) * msw)
                  * 1000000.0 + 0.5) AS BIGINT) AS icc_micro
FROM f"""


QUERIES215 = {
    "events_harmonic_regression": q_events_harmonic_regression,
    "orders_icc": q_orders_icc,
}
