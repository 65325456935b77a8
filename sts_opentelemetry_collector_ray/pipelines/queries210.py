"""Driver-contract queries, wave 210 — Universal Scalability Law fit over
(daily active users → daily events) observations (Gunther's USL via its
linearization, centered 2×2 OLS) and cosine similarity between nations'
supplier-side trade profiles. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES210: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_usl_fit — Universal Scalability Law over daily load points
# ---------------------------------------------------------------------------


def q_events_usl_fit(sf_dir: str):
    """USL fit (Gunther 2007): each day is an observation (N = distinct
    users, C = event count); the linearization N/C = (1/λ)(1 + σ(N−1) +
    κN(N−1)) is an OLS of y = N/C on x₁ = N−1, x₂ = N(N−1) (centered 2×2,
    the wave-207 conditioning trick). λ = 1/b₀, σ = b₁λ, κ = b₂λ, and the
    revenue-optimal concurrency N* = √((1−σ)/κ) (−1 when undefined).
    Output one row: n_days, lambda_micro, sigma_micro, kappa_nano,
    n_star.

    Scale shape: per-batch (day, user) distinct partials → ONE day-bucket
    exchange for exact daily distincts → bounded daily fold; the 2×2 system
    solves on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["ts", "user_id"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        g = df.groupby(["day", "user_id"], sort=False, as_index=False).size()
        g["_b"] = (g["day"].to_numpy(np.int64) % 32).astype(np.int32)
        return g.rename(columns={"size": "n"}).astype({"n": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["day", "user_id"], as_index=False)["n"].sum()
        out = d.groupby("day", as_index=False).agg(
            users=("user_id", "size"), events=("n", "sum")
        )
        return out.astype(np.int64)

    part = (
        ray.data.read_parquet(path, columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n_days", "lambda_micro", "sigma_micro", "kappa_nano", "n_star"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    daily = part.groupby("day")[["users", "events"]].sum()
    nn = daily["users"].to_numpy(np.float64)
    cc = daily["events"].to_numpy(np.float64)
    keep = (nn > 0) & (cc > 0)
    nn, cc = nn[keep], cc[keep]
    if len(nn) < 4:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    y = nn / cc
    x1 = nn - 1.0
    x2 = nn * (nn - 1.0)
    n = float(len(y))
    s1, s2, sy = x1.sum(), x2.sum(), y.sum()
    s11, s22, s12 = (x1 * x1).sum(), (x2 * x2).sum(), (x1 * x2).sum()
    s1y, s2y = (x1 * y).sum(), (x2 * y).sum()
    s11c = s11 - s1 * s1 / n
    s22c = s22 - s2 * s2 / n
    s12c = s12 - s1 * s2 / n
    s1yc = s1y - s1 * sy / n
    s2yc = s2y - s2 * sy / n
    det = s11c * s22c - s12c * s12c
    if det == 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    b1 = (s1yc * s22c - s2yc * s12c) / det
    b2 = (s2yc * s11c - s1yc * s12c) / det
    b0 = sy / n - b1 * (s1 / n) - b2 * (s2 / n)
    if b0 <= 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    lam = 1.0 / b0
    sig = b1 * lam
    kap = b2 * lam
    if kap > 0.0 and sig < 1.0:
        n_star = np.int64(np.floor(np.sqrt((1.0 - sig) / kap) + 0.5))
    else:
        n_star = np.int64(-1)
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "lambda_micro": [np.int64(np.floor(lam * 1_000_000.0 + 0.5))],
            "sigma_micro": [np.int64(np.floor(sig * 1_000_000.0 + 0.5))],
            "kappa_nano": [np.int64(np.floor(kap * 1_000_000_000.0 + 0.5))],
            "n_star": [n_star],
        }
    )


ORACLES210["events_usl_fit"] = """
WITH du AS (
  SELECT CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(DISTINCT user_id) AS DOUBLE) AS nn,
         CAST(count(*) AS DOUBLE) AS cc
  FROM events GROUP BY 1
),
pts AS (
  SELECT nn / cc AS y, nn - 1.0 AS x1, nn * (nn - 1.0) AS x2
  FROM du WHERE nn > 0 AND cc > 0
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
  FROM pts HAVING count(*) >= 4
),
c AS (
  SELECT n, s1, s2, sy,
         s11 - s1 * s1 / n AS s11c, s22 - s2 * s2 / n AS s22c,
         s12 - s1 * s2 / n AS s12c, s1y - s1 * sy / n AS s1yc,
         s2y - s2 * sy / n AS s2yc
  FROM m
),
b AS (
  SELECT n, s1, s2, sy,
         (s1yc * s22c - s2yc * s12c) / (s11c * s22c - s12c * s12c) AS b1,
         (s2yc * s11c - s1yc * s12c) / (s11c * s22c - s12c * s12c) AS b2
  FROM c WHERE s11c * s22c - s12c * s12c <> 0.0
),
f AS (
  SELECT n, b1, b2, sy / n - b1 * (s1 / n) - b2 * (s2 / n) AS b0 FROM b
),
g AS (
  SELECT n, 1.0 / b0 AS lam, b1 * (1.0 / b0) AS sig, b2 * (1.0 / b0) AS kap
  FROM f WHERE b0 > 0.0
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(floor(lam * 1000000.0 + 0.5) AS BIGINT) AS lambda_micro,
       CAST(floor(sig * 1000000.0 + 0.5) AS BIGINT) AS sigma_micro,
       CAST(floor(kap * 1000000000.0 + 0.5) AS BIGINT) AS kappa_nano,
       CAST(CASE WHEN kap > 0.0 AND sig < 1.0
                 THEN floor(sqrt((1.0 - sig) / kap) + 0.5)
                 ELSE -1 END AS BIGINT) AS n_star
FROM g"""


# ---------------------------------------------------------------------------
# nation_profile_similarity — cosine similarity of trade profiles
# ---------------------------------------------------------------------------


def q_nation_profile_similarity(sf_dir: str):
    """Top-5 customer-nation pairs by cosine similarity of their
    supplier-nation revenue profiles (rows of the trade-flow matrix).
    Output: n1, n2, cos_micro — ORDER BY cos_micro DESC, n1, n2.

    Scale shape: the (ci, sj, Σrev) combiner folds the bounded |nations|²
    matrix; pair cosines are one dense matmul on the driver."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
    cn = np.asarray(cust["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    co = np.argsort(ck)
    ck, cn = ck[co], cn[co]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False), np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    ords = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    ok = np.asarray(ords["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    oc = np.asarray(ords["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
    oo = np.argsort(ok)
    ok, oc = ok[oo], oc[oo]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rev = df["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - df["l_discount"].to_numpy(np.float64)
        )
        ci = cn[np.searchsorted(ck, oc[np.searchsorted(ok, df["l_orderkey"].to_numpy(np.int64))])]
        sj = sn[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        out = pd.DataFrame({"ci": ci, "sj": sj, "f": rev})
        return out.groupby(["ci", "sj"], sort=False, as_index=False).sum()

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n1", "n2", "cos_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    fm = part.groupby(["ci", "sj"])["f"].sum()
    cis = np.sort(fm.index.get_level_values(0).unique().to_numpy(np.int64))
    sjs = np.sort(fm.index.get_level_values(1).unique().to_numpy(np.int64))
    mat = np.zeros((len(cis), len(sjs)), np.float64)
    ci_idx = np.searchsorted(cis, fm.index.get_level_values(0).to_numpy(np.int64))
    sj_idx = np.searchsorted(sjs, fm.index.get_level_values(1).to_numpy(np.int64))
    mat[ci_idx, sj_idx] = fm.to_numpy(np.float64)
    rows = []
    for i in range(len(cis)):
        for j in range(i + 1, len(cis)):
            num = float((mat[i] * mat[j]).sum())
            den = np.sqrt(float((mat[i] * mat[i]).sum())) * np.sqrt(
                float((mat[j] * mat[j]).sum())
            )
            if den <= 0.0:
                continue
            rows.append(
                (np.int64(cis[i]), np.int64(cis[j]),
                 np.int64(np.floor(num / den * 1_000_000.0 + 0.5)))
            )
    out = pd.DataFrame(rows, columns=cols).sort_values(
        ["cos_micro", "n1", "n2"], ascending=[False, True, True],
        kind="mergesort",
    ).head(5)
    return out.reset_index(drop=True).astype(np.int64)


ORACLES210["nation_profile_similarity"] = """
WITH fl AS (
  SELECT c.c_nationkey AS ci, s.s_nationkey AS sj,
         sum(l_extendedprice * (1.0 - l_discount)) AS f
  FROM lineitem
  JOIN orders o ON l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nrm AS (SELECT ci, sqrt(sum(f * f)) AS nm FROM fl GROUP BY 1),
pairs AS (
  SELECT a.ci AS n1, b.ci AS n2, sum(a.f * b.f) AS num
  FROM fl a JOIN fl b ON a.sj = b.sj AND a.ci < b.ci
  GROUP BY 1, 2
)
SELECT CAST(p.n1 AS BIGINT) AS n1, CAST(p.n2 AS BIGINT) AS n2,
       CAST(floor(p.num / (x.nm * y.nm) * 1000000.0 + 0.5) AS BIGINT)
         AS cos_micro
FROM pairs p JOIN nrm x ON p.n1 = x.ci JOIN nrm y ON p.n2 = y.ci
WHERE x.nm > 0.0 AND y.nm > 0.0
ORDER BY cos_micro DESC, n1 ASC, n2 ASC LIMIT 5"""


QUERIES210 = {
    "events_usl_fit": q_events_usl_fit,
    "nation_profile_similarity": q_nation_profile_similarity,
}
