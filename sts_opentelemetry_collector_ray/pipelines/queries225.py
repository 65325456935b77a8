"""Driver-contract queries, wave 225 — Oaxaca-Blinder decomposition of the
mean order-value gap between customer segments (two-group OLS, explained/
unexplained split) and banded cross-spectral coherence between event-type
daily series at the weekly frequency.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES225: dict[str, str] = {}


# ---------------------------------------------------------------------------
# orders_oaxaca — Blinder-Oaxaca decomposition of the segment gap
# ---------------------------------------------------------------------------


def q_orders_oaxaca(sf_dir: str):
    """Blinder (1973) / Oaxaca (1973) decomposition: groups A = BUILDING
    customers, B = the rest; per customer x = account balance, y = mean
    order value; OLS y ~ x per group; gap ȳA−ȳB = βA(x̄A−x̄B) [explained]
    + [x̄B(βA−βB) + (αA−αB)] [unexplained] (reference group A). One row:
    n_a, n_b, gap_micro, explained_micro, unexplained_micro.

    Scale shape: per-customer order means fold via a combiner against the
    dimension-sized customer table; two scalar regressions on the
    driver — no shuffle."""
    import pyarrow.parquet as pq

    def oc_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey", "o_totalprice"]).to_pandas()
        df["n"] = 1
        return df.groupby("o_custkey", sort=False, as_index=False).agg(
            n=("n", "sum"), s=("o_totalprice", "sum")
        ).astype({"n": np.int64})

    ocp = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(oc_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_a", "n_b", "gap_micro", "explained_micro", "unexplained_micro"]
    if ocp.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    oc = ocp.groupby("o_custkey").sum()
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    ).to_pandas()
    cust = cust[cust["c_custkey"].isin(oc.index)]
    ck = cust["c_custkey"].to_numpy(np.int64)
    y = (
        oc.loc[ck, "s"].to_numpy(np.float64)
        / oc.loc[ck, "n"].to_numpy(np.float64)
    )
    x = cust["c_acctbal"].to_numpy(np.float64)
    is_a = (cust["c_mktsegment"] == "BUILDING").to_numpy()

    def fit(mask):
        xs, ys = x[mask], y[mask]
        n = float(len(xs))
        sx, sy = xs.sum(), ys.sum()
        sxx = (xs * xs).sum()
        sxy = (xs * ys).sum()
        sxx_c = sxx - sx * sx / n
        if n < 2 or sxx_c <= 0.0:
            return None
        b = (sxy - sx * sy / n) / sxx_c
        a = sy / n - b * (sx / n)
        return n, sx / n, sy / n, a, b

    fa, fb = fit(is_a), fit(~is_a)
    if fa is None or fb is None:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    na, mxa, mya, aa, ba = fa
    nb, mxb, myb, ab, bb = fb
    gap = mya - myb
    explained = ba * (mxa - mxb)
    unexplained = mxb * (ba - bb) + (aa - ab)
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "gap_micro": [micro(gap)],
            "explained_micro": [micro(explained)],
            "unexplained_micro": [micro(unexplained)],
        }
    )


ORACLES225["orders_oaxaca"] = """
WITH oc AS (
  SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS s
  FROM orders GROUP BY 1
),
c AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
         c_acctbal AS x, oc.s / oc.n AS y
  FROM customer JOIN oc ON c_custkey = oc.o_custkey
),
m AS (
  SELECT grp, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM c GROUP BY 1 HAVING count(*) >= 2
),
f AS (
  SELECT grp, n, sx / n AS mx, sy / n AS my,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
         sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sx / n) AS a
  FROM m WHERE sxx - sx * sx / n > 0.0
),
g AS (
  SELECT
    (SELECT n FROM f WHERE grp = 1) AS na,
    (SELECT n FROM f WHERE grp = 0) AS nb,
    (SELECT mx FROM f WHERE grp = 1) AS mxa,
    (SELECT mx FROM f WHERE grp = 0) AS mxb,
    (SELECT my FROM f WHERE grp = 1) AS mya,
    (SELECT my FROM f WHERE grp = 0) AS myb,
    (SELECT a FROM f WHERE grp = 1) AS aa,
    (SELECT a FROM f WHERE grp = 0) AS ab,
    (SELECT b FROM f WHERE grp = 1) AS ba,
    (SELECT b FROM f WHERE grp = 0) AS bb
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(floor((mya - myb) * 1000000.0 + 0.5) AS BIGINT) AS gap_micro,
       CAST(floor(ba * (mxa - mxb) * 1000000.0 + 0.5) AS BIGINT)
         AS explained_micro,
       CAST(floor((mxb * (ba - bb) + (aa - ab)) * 1000000.0 + 0.5) AS BIGINT)
         AS unexplained_micro
FROM g WHERE na IS NOT NULL AND nb IS NOT NULL"""


# ---------------------------------------------------------------------------
# events_weekly_coherence — banded cross-spectral coherence at 1/7 cycles
# ---------------------------------------------------------------------------


def q_events_weekly_coherence(sf_dir: str):
    """Top-3 unordered type pairs by squared coherence in the weekly band:
    over days common to both series (mean-centered), with k* = round(n/7)
    and band K = {k*−1, k*, k*+1} (k ≥ 1), coh² = |Σ_K S_xy|²/(Σ_K S_xx ·
    Σ_K S_yy) with S from DFT components; phase = atan2(Im, Re) of the
    banded cross-spectrum. Output: x_type, y_type, n_days, coh_micro,
    phase_micro.

    Scale shape: bounded daily fold; per-pair DFT components are small
    dot products on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["x_type", "y_type", "n_days", "coh_micro", "phase_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(np.int64 if c not in ("x_type", "y_type")
                                 else object)) for c in cols}
    )
    if daily.empty:
        return empty
    series = {
        et: sub.set_index("day")["n"]
        for et, sub in daily.groupby("event_type", sort=True)
    }
    types = sorted(series)
    rows = []
    for i, xt in enumerate(types):
        for yt in types[i + 1 :]:
            common = series[xt].index.intersection(series[yt].index).sort_values()
            n = len(common)
            if n < 15:
                continue
            x = series[xt].loc[common].to_numpy(np.float64)
            y = series[yt].loc[common].to_numpy(np.float64)
            xc = x - x.sum() / n
            yc = y - y.sum() / n
            t = np.arange(n, dtype=np.float64)
            kstar = int(np.floor(n / 7.0 + 0.5))
            band = [k for k in (kstar - 1, kstar, kstar + 1) if k >= 1]
            re_xy = im_xy = pxx = pyy = 0.0
            for k in band:
                ang = 2.0 * np.pi * k * t / n
                cxv = (xc * np.cos(ang)).sum()
                sxv = (xc * np.sin(ang)).sum()
                cyv = (yc * np.cos(ang)).sum()
                syv = (yc * np.sin(ang)).sum()
                re_xy += cxv * cyv + sxv * syv
                im_xy += sxv * cyv - cxv * syv
                pxx += cxv * cxv + sxv * sxv
                pyy += cyv * cyv + syv * syv
            if pxx <= 0.0 or pyy <= 0.0:
                continue
            coh = (re_xy * re_xy + im_xy * im_xy) / (pxx * pyy)
            phase = np.arctan2(im_xy, re_xy)
            micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
            rows.append((xt, yt, np.int64(n), micro(coh), micro(phase)))
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=cols)
    df = df.sort_values(
        ["coh_micro", "x_type", "y_type"], ascending=[False, True, True],
        kind="mergesort",
    ).head(3)
    return df.reset_index(drop=True).astype(
        {"n_days": np.int64, "coh_micro": np.int64, "phase_micro": np.int64}
    )


ORACLES225["events_weekly_coherence"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT x.event_type AS xt, y.event_type AS yt, x.day,
         x.n AS nx, y.n AS ny
  FROM daily x JOIN daily y ON x.day = y.day AND x.event_type < y.event_type
),
idx AS (
  SELECT xt, yt, nx, ny,
         row_number() OVER (PARTITION BY xt, yt ORDER BY day) - 1 AS t,
         count(*) OVER (PARTITION BY xt, yt) AS n,
         avg(nx) OVER (PARTITION BY xt, yt) AS mx,
         avg(ny) OVER (PARTITION BY xt, yt) AS my
  FROM pairs
),
band AS (
  SELECT DISTINCT xt, yt, n,
         unnest([CAST(floor(n / 7.0 + 0.5) AS BIGINT) - 1,
                 CAST(floor(n / 7.0 + 0.5) AS BIGINT),
                 CAST(floor(n / 7.0 + 0.5) AS BIGINT) + 1]) AS k
  FROM idx WHERE n >= 15
),
b2 AS (SELECT * FROM band WHERE k >= 1),
dft AS (
  SELECT b2.xt, b2.yt, b2.k, b2.n,
         sum((idx.nx - idx.mx) * cos(2.0 * pi() * b2.k * idx.t / b2.n)) AS cx,
         sum((idx.nx - idx.mx) * sin(2.0 * pi() * b2.k * idx.t / b2.n)) AS sx,
         sum((idx.ny - idx.my) * cos(2.0 * pi() * b2.k * idx.t / b2.n)) AS cy,
         sum((idx.ny - idx.my) * sin(2.0 * pi() * b2.k * idx.t / b2.n)) AS sy
  FROM b2 JOIN idx ON idx.xt = b2.xt AND idx.yt = b2.yt
  GROUP BY 1, 2, 3, 4
),
agg AS (
  SELECT xt, yt, any_value(n) AS n,
         sum(cx * cy + sx * sy) AS re_xy,
         sum(sx * cy - cx * sy) AS im_xy,
         sum(cx * cx + sx * sx) AS pxx,
         sum(cy * cy + sy * sy) AS pyy
  FROM dft GROUP BY 1, 2
)
SELECT xt AS x_type, yt AS y_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor((re_xy * re_xy + im_xy * im_xy) / (pxx * pyy)
                  * 1000000.0 + 0.5) AS BIGINT) AS coh_micro,
       CAST(floor(atan2(im_xy, re_xy) * 1000000.0 + 0.5) AS BIGINT)
         AS phase_micro
FROM agg WHERE pxx > 0.0 AND pyy > 0.0
ORDER BY coh_micro DESC, x_type ASC, y_type ASC LIMIT 3"""


QUERIES225 = {
    "orders_oaxaca": q_orders_oaxaca,
    "events_weekly_coherence": q_events_weekly_coherence,
}
