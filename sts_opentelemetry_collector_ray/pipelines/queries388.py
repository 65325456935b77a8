"""Driver-contract queries, wave 388 — empirical-Bayes (Gamma-Poisson)
shrinkage of per-user event counts and Laspeyres/Paasche unit-value
price indices of lineitem by ship year. Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES388: dict[str, str] = {}


# ---------------------------------------------------------------------------
# users_eb_shrinkage — Gamma-Poisson method-of-moments shrinkage
# ---------------------------------------------------------------------------


def q_users_eb_shrinkage(sf_dir: str):
    """Empirical Bayes: user event counts n_u ~ Poisson(lambda_u),
    lambda ~ Gamma(alpha, beta) fit by moments (beta = m/(v - m),
    alpha = m * beta, population variance, exact integer cores); the
    posterior shrinks each count toward the prior with factor
    1/(1 + beta). One row: n_users, mean_milli, var_milli,
    alpha_milli, beta_milli, shrink_factor_micro, max_post_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        return pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "n": g.to_numpy(np.int64)}
        )

    per = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("u")["n"]
        .sum()
    )
    cols = ["n_users", "mean_milli", "var_milli", "alpha_milli",
            "beta_milli", "shrink_factor_micro", "max_post_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if per.empty:
        return empty
    n_v = per.to_numpy(np.int64).astype(object)
    k = len(n_v)
    s = int(n_v.sum())
    s2 = int((n_v * n_v).sum())
    m = float(s) / float(k)
    v = (float(s2) - float(s) * float(s) / float(k)) / float(k)
    if v <= m or m <= 0.0:
        return empty
    beta = m / (v - m)
    alpha = m * beta
    shrink = 1.0 / (1.0 + beta)
    n_max = int(max(int(x) for x in n_v))
    post_max = (alpha + float(n_max)) / (beta + 1.0)
    return pd.DataFrame(
        [
            (
                np.int64(k),
                np.int64(np.floor(m * 1_000.0 + 0.5)),
                np.int64(np.floor(v * 1_000.0 + 0.5)),
                np.int64(np.floor(alpha * 1_000.0 + 0.5)),
                np.int64(np.floor(beta * 1_000.0 + 0.5)),
                np.int64(np.floor(shrink * 1_000_000.0 + 0.5)),
                np.int64(np.floor(post_max * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES388["users_eb_shrinkage"] = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2,
         CAST(max(n) AS BIGINT) AS nmax
  FROM per
),
mom AS (
  SELECT k, nmax,
         CAST(s AS DOUBLE) / k AS m,
         (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / k) / k AS v
  FROM agg
),
fit AS (
  SELECT k, nmax, m, v,
         m / (v - m) AS beta,
         m * (m / (v - m)) AS alpha
  FROM mom
  WHERE v > m AND m > 0
)
SELECT k AS n_users,
       CAST(floor(m * 1000.0 + 0.5) AS BIGINT) AS mean_milli,
       CAST(floor(v * 1000.0 + 0.5) AS BIGINT) AS var_milli,
       CAST(floor(alpha * 1000.0 + 0.5) AS BIGINT) AS alpha_milli,
       CAST(floor(beta * 1000.0 + 0.5) AS BIGINT) AS beta_milli,
       CAST(floor(1.0 / (1.0 + beta) * 1000000.0 + 0.5) AS BIGINT)
         AS shrink_factor_micro,
       CAST(floor((alpha + CAST(nmax AS DOUBLE)) / (beta + 1.0)
                  * 1000.0 + 0.5) AS BIGINT) AS max_post_milli
FROM fit"""


# ---------------------------------------------------------------------------
# lineitem_price_indices — Laspeyres and Paasche by ship year
# ---------------------------------------------------------------------------


def q_lineitem_price_indices(sf_dir: str):
    """Unit-value price indices: per (part, year) the unit value
    p = extended cents / quantity (double) and quantity q (int);
    against the first ship year as base, Laspeyres
    (sum p_t q_0 / sum p_0 q_0) and Paasche (sum p_t q_t /
    sum p_0 q_t) over parts present in both years, folds in partkey
    order. Per year: ship_year, n_common_parts, laspeyres_micro,
    paasche_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        yr = df["l_shipdate"].dt.year.to_numpy(np.int64)
        cents = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        qty = np.floor(
            df["l_quantity"].to_numpy(np.float64) + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"pk": df["l_partkey"].to_numpy(np.int64), "yr": yr,
                 "s": cents, "q": qty}
            )
            .groupby(["pk", "yr"], as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    table = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["pk", "yr"])[["s", "q"]]
        .sum()
        .reset_index()
    )
    cols = ["ship_year", "n_common_parts", "laspeyres_micro",
            "paasche_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if table.empty:
        return empty
    table = table[table["q"] > 0]
    if table.empty:
        return empty
    base_yr = int(table["yr"].min())
    base = {
        int(r["pk"]): (int(r["s"]), int(r["q"]))
        for _, r in table[table["yr"] == base_yr].iterrows()
    }
    rows = []
    for yr in sorted(table["yr"].unique()):
        if int(yr) == base_yr:
            continue
        sub = table[table["yr"] == yr].sort_values("pk")
        l_num = l_den = p_num = p_den = 0.0
        n_common = 0
        for _, r in sub.iterrows():
            pk = int(r["pk"])
            if pk not in base:
                continue
            s0, q0 = base[pk]
            st, qt = int(r["s"]), int(r["q"])
            p0 = float(s0) / float(q0)
            pt = float(st) / float(qt)
            n_common += 1
            l_num = l_num + pt * float(q0)
            l_den = l_den + p0 * float(q0)
            p_num = p_num + pt * float(qt)
            p_den = p_den + p0 * float(qt)
        if n_common == 0 or l_den <= 0.0 or p_den <= 0.0:
            continue
        rows.append(
            (
                np.int64(int(yr)), np.int64(n_common),
                np.int64(np.floor(l_num / l_den * 1_000_000.0 + 0.5)),
                np.int64(np.floor(p_num / p_den * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES388["lineitem_price_indices"] = """
WITH per AS (
  SELECT l_partkey AS pk, CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS q
  FROM lineitem GROUP BY 1, 2
  HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 0
),
base_yr AS (SELECT min(yr) AS b FROM per),
base AS (
  SELECT per.pk, per.s AS s0, per.q AS q0
  FROM per, base_yr WHERE per.yr = base_yr.b
),
joined AS (
  SELECT per.yr, per.pk,
         CAST(base.s0 AS DOUBLE) / base.q0 AS p0,
         CAST(per.s AS DOUBLE) / per.q AS pt,
         base.q0, per.q AS qt
  FROM per JOIN base USING (pk), base_yr
  WHERE per.yr <> base_yr.b
),
folds AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS nc,
         list_reduce(list_prepend(0.0,
           list(pt * CAST(q0 AS DOUBLE) ORDER BY pk)),
           (a, b) -> a + b) AS lnum,
         list_reduce(list_prepend(0.0,
           list(p0 * CAST(q0 AS DOUBLE) ORDER BY pk)),
           (a, b) -> a + b) AS lden,
         list_reduce(list_prepend(0.0,
           list(pt * CAST(qt AS DOUBLE) ORDER BY pk)),
           (a, b) -> a + b) AS pnum,
         list_reduce(list_prepend(0.0,
           list(p0 * CAST(qt AS DOUBLE) ORDER BY pk)),
           (a, b) -> a + b) AS pden
  FROM joined GROUP BY 1
)
SELECT yr AS ship_year, nc AS n_common_parts,
       CAST(floor(lnum / lden * 1000000.0 + 0.5) AS BIGINT)
         AS laspeyres_micro,
       CAST(floor(pnum / pden * 1000000.0 + 0.5) AS BIGINT)
         AS paasche_micro
FROM folds
WHERE nc > 0 AND lden > 0 AND pden > 0
ORDER BY ship_year"""


QUERIES388 = {
    "users_eb_shrinkage": q_users_eb_shrinkage,
    "lineitem_price_indices": q_lineitem_price_indices,
}
