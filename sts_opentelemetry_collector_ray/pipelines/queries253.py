"""Driver-contract queries, wave 253 — Fisher's exact test (1935) on the
weekend × high-value 2×2 (hypergeometric tails via lgamma, the doubling
convention for two-sidedness — robust to no per-term threshold comparisons)
and the Mantel-Haenszel pooled odds ratio + continuity-corrected
Cochran-Mantel-Haenszel test (1959) across ship-year strata.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES253: dict[str, str] = {}

_CHI2_1_CRIT = 3.841458820694124  # chi2(1) at 5%


# ---------------------------------------------------------------------------
# events_fisher_exact — weekend × high-value association, exact
# ---------------------------------------------------------------------------


def q_events_fisher_exact(sf_dir: str):
    """Fisher's exact test on the 2×2 (weekend = ISO dow ≥ 6) ×
    (high value = value ≥ the lower-median): hypergeometric
    P(k) = C(c1,k)·C(n−c1, r1−k)/C(n,r1) via lgamma, left tail
    P(K ≤ a), right tail P(K ≥ a), two-sided by the DOUBLING convention
    p₂ = min(1, 2·min(p_left, p_right)) (no per-term probability
    comparisons — engine-stable). One row: n, a, r1, c1, p_left_micro,
    p_right_micro, p_two_micro.

    Scale shape: one (weekend, high) 4-cell combiner pass after a
    lower-median fold; the tail is a ≤ min(r1,c1)-term lgamma sum on the
    driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["ts", "value"]).to_pandas()
        wk = (df["ts"].dt.dayofweek >= 5).to_numpy()  # pandas Mon=0 -> ISO 6,7
        return pd.DataFrame({"wk": wk, "value": df["value"].to_numpy()})

    per = (
        ray.data.read_parquet(path, columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "a", "r1", "c1", "p_left_micro", "p_right_micro",
            "p_two_micro"]
    if per.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    v = per["value"].to_numpy(np.float64)
    n = len(per)
    med = np.sort(v)[(n + 1) // 2 - 1]
    hi = v >= med
    wk = per["wk"].to_numpy(bool)
    a = int((wk & hi).sum())       # weekend & high
    r1 = int(wk.sum())             # weekend margin
    c1 = int(hi.sum())             # high margin

    def logc(m: int, k: int) -> float:
        return (math.lgamma(m + 1) - math.lgamma(k + 1)
                - math.lgamma(m - k + 1))

    lo = max(0, r1 + c1 - n)
    hi_k = min(r1, c1)
    denom = logc(n, r1)
    pl = 0.0
    pr = 0.0
    for k in range(lo, hi_k + 1):
        p = math.exp(logc(c1, k) + logc(n - c1, r1 - k) - denom)
        if k <= a:
            pl += p
        if k >= a:
            pr += p
    p2 = min(1.0, 2.0 * min(pl, pr))
    mk = lambda x: np.int64(np.floor(x * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        {
            "n": [np.int64(n)], "a": [np.int64(a)],
            "r1": [np.int64(r1)], "c1": [np.int64(c1)],
            "p_left_micro": [mk(min(1.0, pl))],
            "p_right_micro": [mk(min(1.0, pr))],
            "p_two_micro": [mk(p2)],
        }
    )


ORACLES253["events_fisher_exact"] = """
WITH per AS (
  SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS wk, value
  FROM events
),
med AS (
  SELECT value AS m FROM (
    SELECT value, row_number() OVER (ORDER BY value) AS r,
           count(*) OVER () AS n
    FROM per
  ) WHERE r = (n + 1) // 2
),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN wk = 1 AND value >= med.m THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(sum(wk) AS BIGINT) AS r1,
         CAST(sum(CASE WHEN value >= med.m THEN 1 ELSE 0 END) AS BIGINT)
           AS c1
  FROM per, med GROUP BY med.m
),
terms AS (
  SELECT cells.n, cells.a, cells.r1, cells.c1, k,
         exp(lgamma(cells.c1 + 1.0) - lgamma(k + 1.0)
             - lgamma(cells.c1 - k + 1.0)
             + lgamma(cells.n - cells.c1 + 1.0)
             - lgamma(cells.r1 - k + 1.0)
             - lgamma(cells.n - cells.c1 - cells.r1 + k + 1.0)
             - (lgamma(cells.n + 1.0) - lgamma(cells.r1 + 1.0)
                - lgamma(cells.n - cells.r1 + 1.0))) AS p
  FROM cells, unnest(range(0, 100000)) AS u(k)
  WHERE k >= greatest(0, cells.r1 + cells.c1 - cells.n)
    AND k <= least(cells.r1, cells.c1)
),
tails AS (
  SELECT n, a, r1, c1,
         sum(CASE WHEN k <= a THEN p ELSE 0 END) AS pl,
         sum(CASE WHEN k >= a THEN p ELSE 0 END) AS pr
  FROM terms GROUP BY n, a, r1, c1
)
SELECT n, a, r1, c1,
       CAST(floor(least(1.0, pl) * 1000000.0 + 0.5) AS BIGINT)
         AS p_left_micro,
       CAST(floor(least(1.0, pr) * 1000000.0 + 0.5) AS BIGINT)
         AS p_right_micro,
       CAST(floor(least(1.0, 2.0 * least(pl, pr)) * 1000000.0 + 0.5)
            AS BIGINT) AS p_two_micro
FROM tails"""


# ---------------------------------------------------------------------------
# lineitem_mantel_haenszel — pooled odds ratio across ship-year strata
# ---------------------------------------------------------------------------


def q_lineitem_mantel_haenszel(sf_dir: str):
    """Mantel-Haenszel pooled odds ratio and the continuity-corrected CMH
    test of (discount ≥ 0.06) × (returnflag = 'R') across ship-YEAR
    strata: OR_MH = Σ aᵢdᵢ/nᵢ / Σ bᵢcᵢ/nᵢ, χ²_CMH = (|Σaᵢ − ΣEᵢ| − ½)²
    / ΣVᵢ with Eᵢ = r1ᵢc1ᵢ/nᵢ, Vᵢ = r1ᵢr0ᵢc1ᵢc0ᵢ/(nᵢ²(nᵢ−1)); strata
    with nᵢ < 2 drop. One row: n_strata, or_mh_micro, cmh_micro,
    reject_5pct.

    Scale shape: per-batch (year, 4-cell) integer combiner; the pooled
    algebra is a |years|-term ordered scan on the driver."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["l_shipdate", "l_discount", "l_returnflag"]).to_pandas()
        y = df["l_shipdate"].dt.year.to_numpy(np.int64)
        e = (df["l_discount"].to_numpy(np.float64) >= 0.06).astype(np.int64)
        r = (df["l_returnflag"].to_numpy(object) == "R").astype(np.int64)
        g = pd.DataFrame(
            {"year": y, "one": np.ones(len(y), np.int64),
             "a": e & r, "b": e & (1 - r), "c": (1 - e) & r}
        )
        out = g.groupby("year", sort=False, as_index=False).sum()
        out = out.rename(columns={"one": "n"}).astype(
            {c: np.int64 for c in ("n", "a", "b", "c")}
        )
        return out[["year", "n", "a", "b", "c"]]

    per = (
        ray.data.read_parquet(
            path, columns=["l_shipdate", "l_discount", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_strata", "or_mh_micro", "cmh_micro", "reject_5pct"]
    if per.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = per.groupby("year", as_index=False)[["n", "a", "b", "c"]].sum()
    g = g[g["n"] >= 2].sort_values("year")
    if g.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n_i = g["n"].to_numpy(np.float64)
    a_i = g["a"].to_numpy(np.float64)
    b_i = g["b"].to_numpy(np.float64)
    c_i = g["c"].to_numpy(np.float64)
    d_i = n_i - a_i - b_i - c_i
    r1 = a_i + b_i
    r0 = c_i + d_i
    col1 = a_i + c_i
    col0 = b_i + d_i
    # ordered (year-ascending) left-to-right folds — mirrors the SQL
    # running-window sums exactly
    num = 0.0
    den = 0.0
    sa = 0.0
    se = 0.0
    sv = 0.0
    for i in range(len(g)):
        num += a_i[i] * d_i[i] / n_i[i]
        den += b_i[i] * c_i[i] / n_i[i]
        sa += a_i[i]
        se += r1[i] * col1[i] / n_i[i]
        sv += (r1[i] * r0[i] * col1[i] * col0[i]
               / (n_i[i] * n_i[i] * (n_i[i] - 1.0)))
    or_mh = num / den if den > 0.0 else 0.0
    cmh = ((abs(sa - se) - 0.5) ** 2 / sv) if sv > 0.0 else 0.0
    return pd.DataFrame(
        {
            "n_strata": [np.int64(len(g))],
            "or_mh_micro": [np.int64(np.floor(or_mh * 1_000_000.0 + 0.5))],
            "cmh_micro": [np.int64(np.floor(cmh * 1_000_000.0 + 0.5))],
            "reject_5pct": [np.int64(1 if cmh > _CHI2_1_CRIT else 0)],
        }
    )


ORACLES253["lineitem_mantel_haenszel"] = """
WITH cells AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN l_discount >= 0.06 AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN l_discount < 0.06 AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM lineitem GROUP BY 1 HAVING count(*) >= 2
),
terms AS (
  SELECT year, n, a, b, c, n - a - b - c AS d,
         a + b AS r1, (n - a - b - c) + c AS r0,
         a + c AS c1, b + (n - a - b - c) AS c0
  FROM cells
),
last AS (
  SELECT sum(a * d * 1.0 / n) AS num,
         sum(b * c * 1.0 / n) AS den,
         sum(a * 1.0) AS sa,
         sum(r1 * c1 * 1.0 / n) AS se,
         sum(r1 * r0 * c1 * c0 * 1.0 / (n * n * (n - 1.0))) AS sv
  FROM terms
),
strata AS (SELECT CAST(count(*) AS BIGINT) AS n_strata FROM terms)
SELECT strata.n_strata,
       CAST(floor(CASE WHEN last.den > 0.0 THEN last.num / last.den
                       ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT)
         AS or_mh_micro,
       CAST(floor(CASE WHEN last.sv > 0.0
                       THEN (abs(last.sa - last.se) - 0.5)
                            * (abs(last.sa - last.se) - 0.5) / last.sv
                       ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT)
         AS cmh_micro,
       CAST(CASE WHEN last.sv > 0.0
                  AND (abs(last.sa - last.se) - 0.5)
                      * (abs(last.sa - last.se) - 0.5) / last.sv
                      > 3.841458820694124
            THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM last, strata"""


QUERIES253 = {
    "events_fisher_exact": q_events_fisher_exact,
    "lineitem_mantel_haenszel": q_lineitem_mantel_haenszel,
}
