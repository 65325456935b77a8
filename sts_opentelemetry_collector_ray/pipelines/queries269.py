"""Driver-contract queries, wave 269 — the Koenker (studentized)
Breusch-Pagan heteroskedasticity test for extendedprice ~ quantity, and
a Simpson's-paradox sign-reversal detector for the discount/returns
association across shipping-year strata (exact integer covariance
numerators). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES269: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_breusch_pagan — Koenker LM = n * R^2 of e^2 on x
# ---------------------------------------------------------------------------


def q_lineitem_breusch_pagan(sf_dir: str):
    """Koenker's studentized Breusch-Pagan test: fit extendedprice ~
    quantity by OLS (pass 1: five-moment fold — the `lineitem_chow_test`
    idiom, where quantity/price sums stay exactly representable so b0/b1
    are bit-identical to the oracle), then regress e^2 on x (pass 2:
    per-batch vectorized residual fold of Se2, Se4, Se2x) and report
    LM = n R^2 against the chi-square(1) 5% critical value. One row:
    n, slope_micro, lm_micro, reject_5pct.

    Scale shape: two moment folds, no shuffle — the driver sees
    blocks x 6 scalars per pass."""
    path = f"{sf_dir}/lineitem.parquet"
    ds = ray.data.read_parquet(path, columns=["l_quantity", "l_extendedprice"])

    def m1(t: pa.Table) -> pd.DataFrame:
        x = t["l_quantity"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))], "sx": [x.sum()], "sy": [y.sum()],
                "sxy": [(x * y).sum()], "sxx": [(x * x).sum()],
            }
        )

    p1 = ds.map_batches(m1, batch_format="pyarrow").to_pandas().sum()
    cols = ["n", "slope_micro", "lm_micro", "reject_5pct"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = int(p1["n"])
    if n < 3:
        return empty
    sx, sy, sxy, sxx = (
        float(p1["sx"]), float(p1["sy"]), float(p1["sxy"]), float(p1["sxx"])
    )
    nf = float(n)
    sxx_c = sxx - sx * sx / nf
    b1 = (sxy - sx * sy / nf) / sxx_c
    b0 = (sy - b1 * sx) / nf

    def m2(t: pa.Table) -> pd.DataFrame:
        x = t["l_quantity"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        e = y - b0 - b1 * x
        e2 = e * e
        return pd.DataFrame(
            {
                "se2": [e2.sum()], "se4": [(e2 * e2).sum()],
                "se2x": [(e2 * x).sum()],
            }
        )

    p2 = ds.map_batches(m2, batch_format="pyarrow").to_pandas().sum()
    se2, se4, se2x = float(p2["se2"]), float(p2["se4"]), float(p2["se2x"])
    sst = se4 - se2 * se2 / nf  # centered variation of e^2
    num = se2x - sx * se2 / nf  # centered cross-sum with x
    if sst <= 0.0 or sxx_c <= 0.0:
        return empty
    lm = nf * (num * num) / (sst * sxx_c)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(b1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(lm * 1_000_000.0 + 0.5)),
                np.int64(1 if lm > 3.841458820694124 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES269["lineitem_breusch_pagan"] = """
WITH m AS (
  SELECT count(*) AS n, sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx
  FROM lineitem
),
fit AS (
  SELECT n, sx, sxx, sxx - sx * sx / n AS sxx_c,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b1,
         (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n AS b0
  FROM m
),
aux AS (
  SELECT sum((l_extendedprice - fit.b0 - fit.b1 * l_quantity)
             * (l_extendedprice - fit.b0 - fit.b1 * l_quantity)) AS se2,
         sum(((l_extendedprice - fit.b0 - fit.b1 * l_quantity)
              * (l_extendedprice - fit.b0 - fit.b1 * l_quantity))
             * ((l_extendedprice - fit.b0 - fit.b1 * l_quantity)
                * (l_extendedprice - fit.b0 - fit.b1 * l_quantity))) AS se4,
         sum(((l_extendedprice - fit.b0 - fit.b1 * l_quantity)
              * (l_extendedprice - fit.b0 - fit.b1 * l_quantity))
             * l_quantity) AS se2x
  FROM lineitem, fit
),
lm AS (
  SELECT fit.n, fit.b1,
         fit.n * (aux.se2x - fit.sx * aux.se2 / fit.n)
               * (aux.se2x - fit.sx * aux.se2 / fit.n)
           / ((aux.se4 - aux.se2 * aux.se2 / fit.n) * fit.sxx_c) AS stat
  FROM fit, aux
  WHERE (aux.se4 - aux.se2 * aux.se2 / fit.n) > 0 AND fit.sxx_c > 0
        AND fit.n >= 3
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(b1 * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
       CAST(floor(stat * 1000000.0 + 0.5) AS BIGINT) AS lm_micro,
       CAST(CASE WHEN stat > 3.841458820694124 THEN 1 ELSE 0 END AS BIGINT)
         AS reject_5pct
FROM lm"""


# ---------------------------------------------------------------------------
# lineitem_simpson_reversal — stratified association sign flips
# ---------------------------------------------------------------------------


def q_lineitem_simpson_reversal(sf_dir: str):
    """Simpson's-paradox detector: the discount -> returned association
    measured by the EXACT integer covariance numerator
    cov_num = n*Sxy - Sx*Sy with x = discount in milli (integer) and
    y = is_returned (0/1), computed pooled and per shipping-year
    stratum. A stratum 'reverses' when its sign is strictly opposite
    the pooled sign. Per year: ship_year, n, cov_num, sign_stratum,
    sign_pooled, reversed — all exact integers, no floats anywhere.

    Scale shape: one bounded per-batch (year -> moment) combiner; the
    driver folds |years| x blocks scalar rows."""
    path = f"{sf_dir}/lineitem.parquet"
    ds = ray.data.read_parquet(
        path, columns=["l_shipdate", "l_discount", "l_returnflag"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        x = np.floor(
            df["l_discount"].to_numpy(np.float64) * 1000.0 + 0.5
        ).astype(np.int64)
        y = (df["l_returnflag"].to_numpy() == "R").astype(np.int64)
        yr = df["l_shipdate"].dt.year.to_numpy().astype(np.int64)
        m = pd.DataFrame(
            {"yr": yr, "n": 1, "sx": x, "sy": y, "sxy": x * y}
        )
        out = m.groupby("yr", sort=False, as_index=False).sum()
        return out.astype(
            {"n": np.int64, "sx": np.int64, "sy": np.int64, "sxy": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("yr")[["n", "sx", "sy", "sxy"]]
        .sum()
        .sort_index()
    )
    cols = [
        "ship_year", "n", "cov_num", "sign_stratum", "sign_pooled", "reversed",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    ns = part["n"].to_numpy(np.int64)
    sx = part["sx"].to_numpy(np.int64)
    sy = part["sy"].to_numpy(np.int64)
    sxy = part["sxy"].to_numpy(np.int64)
    cov = ns * sxy - sx * sy
    np_, sxp, syp, sxyp = (
        int(ns.sum()), int(sx.sum()), int(sy.sum()), int(sxy.sum())
    )
    cov_p = np_ * sxyp - sxp * syp
    sgn = np.sign(cov).astype(np.int64)
    sgn_p = int(np.sign(cov_p))
    return pd.DataFrame(
        {
            "ship_year": part.index.to_numpy(np.int64),
            "n": ns,
            "cov_num": cov,
            "sign_stratum": sgn,
            "sign_pooled": np.full(len(ns), sgn_p, np.int64),
            "reversed": ((sgn * sgn_p) < 0).astype(np.int64),
        }
    )[cols]


ORACLES269["lineitem_simpson_reversal"] = """
WITH base AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM lineitem
),
strata AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM base GROUP BY 1
),
pooled AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
         CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy
  FROM strata
),
ps AS (
  SELECT CAST(sign(n * sxy - sx * sy) AS BIGINT) AS sgn FROM pooled
)
SELECT s.yr AS ship_year, s.n,
       CAST(s.n * s.sxy - s.sx * s.sy AS BIGINT) AS cov_num,
       CAST(sign(s.n * s.sxy - s.sx * s.sy) AS BIGINT) AS sign_stratum,
       ps.sgn AS sign_pooled,
       CAST(CASE WHEN sign(s.n * s.sxy - s.sx * s.sy) * ps.sgn < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS reversed
FROM strata s, ps
ORDER BY s.yr"""


QUERIES269 = {
    "lineitem_breusch_pagan": q_lineitem_breusch_pagan,
    "lineitem_simpson_reversal": q_lineitem_simpson_reversal,
}
