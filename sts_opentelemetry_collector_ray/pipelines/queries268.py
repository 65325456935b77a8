"""Driver-contract queries, wave 268 — first-order detrended fluctuation
analysis (DFA-1) of the daily event-count profile (exact integer box
least-squares via the scaled-profile trick) and closed-form 2-D
Mahalanobis outlier ranking over customers (balance x order count,
exact HUGEINT quadratic form). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sts_opentelemetry_collector_ray.pipelines.queries264 import (
    _daily_counts,
    _grid,
)

ORACLES268: dict[str, str] = {}

_DAY_US = 86_400_000_000

_DFA_SCALES = (4, 8, 16, 32, 64)


# ---------------------------------------------------------------------------
# events_dfa — detrended fluctuation analysis, linear detrend per box
# ---------------------------------------------------------------------------


def q_events_dfa(sf_dir: str):
    """DFA-1 of the daily series: profile scaled by n to stay integer
    (P_t = n*cumsum(y)_t - t*N), split into complete boxes of size s in
    {4,8,16,32,64}, OLS-detrended per box with the EXACT integer SSE
    identity SSE = ((s^2-1)A - 3B^2) / (s(s^2-1)) where
    A = s*Syy - Sy^2 and B = 2*Sxy - (s+1)*Sy; the fluctuation
    F(s) = sqrt(sum_boxes NUM / (s(s^2-1) m s n^2)) is one division +
    sqrt per scale, and alpha is the log-log OLS slope over the kept
    scales (the long-range-dependence exponent, complementing
    `events_hurst_rs` which uses rescaled range). Per scale: s, m_boxes,
    fluct_micro, alpha_micro (alpha repeated per row).

    Scale shape: bounded per-batch (day -> count) combiner; the
    calendar-bounded grid arithmetic runs on the driver."""
    days = _daily_counts(sf_dir)
    cols = ["s", "m_boxes", "fluct_micro", "alpha_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    N = int(y.sum())
    cum = np.cumsum(y.astype(np.int64))
    P = (n * cum - (np.arange(1, n + 1, dtype=np.int64)) * N).astype(object)
    pts = []
    for s in _DFA_SCALES:
        m = n // s
        if m < 2:
            continue
        Pb = P[: m * s].reshape(m, s)
        t = np.arange(1, s + 1, dtype=object)
        Sy = Pb.sum(axis=1)
        Syy = (Pb * Pb).sum(axis=1)
        Sxy = (Pb * t).sum(axis=1)
        A = s * Syy - Sy * Sy
        B = 2 * Sxy - (s + 1) * Sy
        num = int(((s * s - 1) * A - 3 * B * B).sum())
        if num <= 0:
            continue
        den = float(s * (s * s - 1)) * float(m) * float(s) * float(n) * float(n)
        f = float(np.sqrt(float(num) / den))
        pts.append((s, m, f))
    if len(pts) < 2:
        return empty
    lx = np.log([float(p[0]) for p in pts])
    ly = np.log([p[2] for p in pts])
    k = float(len(pts))
    alpha = (k * float((lx * ly).sum()) - float(lx.sum()) * float(ly.sum())) / (
        k * float((lx * lx).sum()) - float(lx.sum()) ** 2
    )
    a_micro = np.int64(np.floor(alpha * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        [
            (
                np.int64(s), np.int64(m),
                np.int64(np.floor(f * 1_000_000.0 + 0.5)), a_micro,
            )
            for s, m, f in pts
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES268["events_dfa"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS tot FROM x),
prof AS (
  SELECT x.t,
         nn.n * (sum(x.y) OVER (ORDER BY x.t)) - (x.t + 1) * nn.tot AS p
  FROM x, nn
),
scales AS (SELECT CAST(u.s AS BIGINT) AS s
           FROM (SELECT unnest([4, 8, 16, 32, 64]) AS s) u),
boxed AS (
  SELECT scales.s, prof.t // scales.s AS box,
         prof.t % scales.s + 1 AS tl, prof.p
  FROM scales CROSS JOIN prof
),
bsum AS (
  SELECT s, box,
         CAST(count(*) AS BIGINT) AS w,
         CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(p AS HUGEINT) * p) AS HUGEINT) AS syy,
         CAST(sum(CAST(tl AS HUGEINT) * p) AS HUGEINT) AS sxy
  FROM boxed GROUP BY 1, 2
),
pernum AS (
  SELECT s,
         (s * s - 1) * (s * syy - sy * sy)
           - 3 * (2 * sxy - (s + 1) * sy) * (2 * sxy - (s + 1) * sy) AS numb
  FROM bsum WHERE w = s
),
per AS (
  SELECT s, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(numb) AS HUGEINT) AS num
  FROM pernum GROUP BY s
),
f AS (
  SELECT per.s, per.m,
         sqrt(CAST(per.num AS DOUBLE)
              / (CAST(per.s * (per.s * per.s - 1) AS DOUBLE)
                 * CAST(per.m AS DOUBLE) * CAST(per.s AS DOUBLE)
                 * CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE))) AS fl
  FROM per, nn
  WHERE per.m >= 2 AND per.num > 0
),
reg AS (
  SELECT (count(*) * sum(ln(CAST(s AS DOUBLE)) * ln(fl))
          - sum(ln(CAST(s AS DOUBLE))) * sum(ln(fl)))
         / (count(*) * sum(ln(CAST(s AS DOUBLE)) * ln(CAST(s AS DOUBLE)))
            - sum(ln(CAST(s AS DOUBLE))) * sum(ln(CAST(s AS DOUBLE))))
           AS alpha,
         count(*) AS k
  FROM f
)
SELECT f.s, f.m AS m_boxes,
       CAST(floor(f.fl * 1000000.0 + 0.5) AS BIGINT) AS fluct_micro,
       CAST(floor(reg.alpha * 1000000.0 + 0.5) AS BIGINT) AS alpha_micro
FROM f, reg
WHERE reg.k >= 2
ORDER BY f.s"""


# ---------------------------------------------------------------------------
# customer_mahalanobis — closed-form 2-D outlier ranking
# ---------------------------------------------------------------------------

_MB_BUCKETS = 64


def q_customer_mahalanobis(sf_dir: str):
    """Top-10 Mahalanobis outliers over per-customer features
    (balance cents, order count): with scaled centers u = n*x1 - S1,
    v = n*x2 - S2 and scaled covariances C11 = n*S11 - S1^2 (etc.),
    d^2 = (u^2 C22 - 2uv C12 + v^2 C11) / (C11 C22 - C12^2) — the
    denominator is shared by every row, so the ranking orders by the
    EXACT integer numerator (HUGEINT in SQL, arbitrary-precision ints
    here); d2_micro is the one division. Per row: c_custkey, n_orders,
    bal_cents, d2_micro.

    Scale shape: order counts reduce via per-batch partials + ONE
    custkey-bucket exchange (the `customer_rfm` idiom); customers are
    the corpus-reduced small side."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("o_custkey", sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        g["pn"] = g["pn"].astype(np.int64)
        g["_b"] = (g["o_custkey"].to_numpy(np.int64) % _MB_BUCKETS).astype(
            np.int64
        )
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", sort=False)["pn"].sum().reset_index()
        out.columns = ["o_custkey", "n_orders"]
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out[["o_custkey", "n_orders"]]

    counts = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # corpus-reduced small side (customers << orders)
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    cols = ["c_custkey", "n_orders", "bal_cents", "d2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cust.empty:
        return empty
    df = cust.merge(
        counts, left_on="c_custkey", right_on="o_custkey", how="left"
    )
    x1 = np.floor(df["c_acctbal"].to_numpy(np.float64) * 100.0 + 0.5).astype(
        np.int64
    )
    x2 = df["n_orders"].fillna(0).to_numpy(np.int64)
    n = len(df)
    s1, s2 = int(x1.sum()), int(x2.sum())
    s11 = int((x1.astype(object) * x1.astype(object)).sum())
    s22 = int((x2.astype(object) * x2.astype(object)).sum())
    s12 = int((x1.astype(object) * x2.astype(object)).sum())
    c11, c22, c12 = n * s11 - s1 * s1, n * s22 - s2 * s2, n * s12 - s1 * s2
    det = c11 * c22 - c12 * c12
    if det <= 0:
        return empty
    u = (n * x1.astype(object) - s1)
    v = (n * x2.astype(object) - s2)
    num = u * u * c22 - 2 * u * v * c12 + v * v * c11
    out = pd.DataFrame(
        {
            "c_custkey": df["c_custkey"].to_numpy(np.int64),
            "n_orders": x2,
            "bal_cents": x1,
            "_num": num,
        }
    )
    out = out.sort_values(
        ["_num", "c_custkey"], ascending=[False, True]
    ).head(10)
    out["d2_micro"] = np.array(
        [
            int(np.floor(float(q) / float(det) * 1_000_000.0 + 0.5))
            for q in out["_num"]
        ],
        np.int64,
    )
    return out.drop(columns="_num").reset_index(drop=True).astype(
        {c: np.int64 for c in cols}
    )[cols]


ORACLES268["customer_mahalanobis"] = """
WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
feat AS (
  SELECT c.c_custkey,
         CAST(coalesce(oc.n_orders, 0) AS BIGINT) AS n_orders,
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
  FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(bal_cents AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(sum(CAST(n_orders AS HUGEINT)) AS HUGEINT) AS s2,
         CAST(sum(CAST(bal_cents AS HUGEINT) * bal_cents) AS HUGEINT) AS s11,
         CAST(sum(CAST(n_orders AS HUGEINT) * n_orders) AS HUGEINT) AS s22,
         CAST(sum(CAST(bal_cents AS HUGEINT) * n_orders) AS HUGEINT) AS s12
  FROM feat
),
cov AS (
  SELECT n, n * s11 - s1 * s1 AS c11, n * s22 - s2 * s2 AS c22,
         n * s12 - s1 * s2 AS c12, s1, s2
  FROM m
),
q AS (
  SELECT f.c_custkey, f.n_orders, f.bal_cents,
         (cov.n * f.bal_cents - cov.s1) * (cov.n * f.bal_cents - cov.s1)
           * cov.c22
         - 2 * (cov.n * f.bal_cents - cov.s1)
             * (cov.n * f.n_orders - cov.s2) * cov.c12
         + (cov.n * f.n_orders - cov.s2) * (cov.n * f.n_orders - cov.s2)
           * cov.c11 AS num,
         cov.c11 * cov.c22 - cov.c12 * cov.c12 AS det
  FROM feat f, cov
)
SELECT c_custkey, n_orders, bal_cents,
       CAST(floor(CAST(num AS DOUBLE) / CAST(det AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS d2_micro
FROM q
WHERE det > 0
ORDER BY num DESC, c_custkey
LIMIT 10"""


QUERIES268 = {
    "events_dfa": q_events_dfa,
    "customer_mahalanobis": q_customer_mahalanobis,
}
