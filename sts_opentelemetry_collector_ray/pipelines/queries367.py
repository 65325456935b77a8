"""Driver-contract queries, wave 367 — Weibull shape estimation on
pooled user inter-event gaps (log-log median-rank regression) and the
per-nation Welch t between supplier and customer account balances.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES367: dict[str, str] = {}

_WB_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_gap_weibull_shape — log-log Weibull plot regression
# ---------------------------------------------------------------------------


def q_users_gap_weibull_shape(sf_dir: str):
    """Weibull probability-plot fit on pooled per-user inter-event
    gaps (microseconds, > 0): with the gap histogram, each distinct
    gap g carries weight c and plotting position F = cum / (n + 1);
    weighted OLS of y = ln(-ln(1 - F)) on x = ln(g) gives the shape
    (slope) and ln-scale (x at y = 0). Counts exact; log sums float
    (milli rounding absorbs). One row: n_gaps, n_distinct,
    shape_milli, ln_scale_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        df["_b"] = (df["u"] % _WB_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {"g": pd.Series([], dtype=np.int64),
             "c": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        gaps = gaps[gaps > 0]
        if len(gaps) == 0:
            return zero
        h = pd.Series(gaps).groupby(gaps).size()
        return pd.DataFrame(
            {"g": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("g")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n_gaps", "n_distinct", "shape_milli", "ln_scale_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    g = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    v = len(g)
    if n < 20 or v < 3:
        return empty
    cum = np.cumsum(c)
    x = np.log(g.astype(np.float64))
    f = cum.astype(np.float64) / float(n + 1)
    y = np.log(-np.log(1.0 - f))
    w = c.astype(np.float64)
    sw = float(w.sum())
    swx = float((w * x).sum())
    swy = float((w * y).sum())
    swxx = float((w * x * x).sum())
    swxy = float((w * x * y).sum())
    det = sw * swxx - swx * swx
    if det <= 0.0:
        return empty
    slope = (sw * swxy - swx * swy) / det
    if slope == 0.0:
        return empty
    intercept = (swy - slope * swx) / sw
    ln_scale = -intercept / slope
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(v),
                np.int64(np.floor(slope * 1_000.0 + 0.5)),
                np.int64(np.floor(ln_scale * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES367["users_gap_weibull_shape"] = """
WITH seq AS (
  SELECT epoch_us(ts)
           - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
h AS (
  SELECT CAST(gap AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE gap IS NOT NULL AND gap > 0 GROUP BY 1
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS v FROM h),
pts AS (
  SELECT g, c, sum(c) OVER (ORDER BY g) AS cum FROM h
),
xy AS (
  SELECT CAST(c AS DOUBLE) AS w,
         ln(CAST(g AS DOUBLE)) AS x,
         ln(-ln(1.0 - CAST(cum AS DOUBLE) / (nn.n + 1))) AS y
  FROM pts, nn
),
s AS (
  SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
         sum(w * x * x) AS swxx, sum(w * x * y) AS swxy
  FROM xy
),
f AS (
  SELECT nn.n, nn.v,
         (s.sw * s.swxy - s.swx * s.swy)
           / (s.sw * s.swxx - s.swx * s.swx) AS slope,
         s.sw, s.swx, s.swy,
         s.sw * s.swxx - s.swx * s.swx AS det
  FROM nn, s
)
SELECT n AS n_gaps, v AS n_distinct,
       CAST(floor(slope * 1000.0 + 0.5) AS BIGINT) AS shape_milli,
       CAST(floor(-((swy - slope * swx) / sw) / slope * 1000.0 + 0.5)
            AS BIGINT) AS ln_scale_milli
FROM f
WHERE n >= 20 AND v >= 3 AND det > 0 AND slope <> 0"""


# ---------------------------------------------------------------------------
# nation_balance_gap_welch — supplier vs customer balances per nation
# ---------------------------------------------------------------------------


def q_nation_balance_gap_welch(sf_dir: str):
    """Per nation: Welch's t between supplier and customer account
    balances (cents). Exact per-nation (n, S, Q) integer cores from
    both tables; the t statistic and Welch-Satterthwaite df are
    mirrored float compositions. Per nation (both sides n >= 2,
    variance > 0): nationkey, n_supp, n_cust, t_micro, df_milli."""

    def fold(table: str, key: str, bal: str):
        def partial(t: pa.Table) -> pd.DataFrame:
            nk = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                t[bal].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            g = (
                pd.DataFrame(
                    {"nk": nk, "n": 1, "s": cents, "q": cents * cents}
                )
                .groupby("nk", as_index=False)
                .sum()
            )
            return g.astype(np.int64)

        return (
            ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                  columns=[key, bal])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("nk")[["n", "s", "q"]]
            .sum()
        )

    supp = fold("supplier", "s_nationkey", "s_acctbal")
    cust = fold("customer", "c_nationkey", "c_acctbal")
    cols = ["nationkey", "n_supp", "n_cust", "t_micro", "df_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    rows = []
    for nk in sorted(set(supp.index) & set(cust.index)):
        na, nb = int(supp.loc[nk, "n"]), int(cust.loc[nk, "n"])
        if na < 2 or nb < 2:
            continue
        sa, sb = int(supp.loc[nk, "s"]), int(cust.loc[nk, "s"])
        qa, qb = int(supp.loc[nk, "q"]), int(cust.loc[nk, "q"])
        va = (float(qa) - float(sa) * sa / na) / float(na - 1)
        vb = (float(qb) - float(sb) * sb / nb) / float(nb - 1)
        if va <= 0.0 or vb <= 0.0:
            continue
        se2 = va / na + vb / nb
        t = (float(sa) / na - float(sb) / nb) / float(np.sqrt(se2))
        df = se2 * se2 / (
            (va / na) * (va / na) / (na - 1)
            + (vb / nb) * (vb / nb) / (nb - 1)
        )
        rows.append(
            (
                np.int64(nk), np.int64(na), np.int64(nb),
                np.int64(np.floor(t * 1_000_000.0 + 0.5)),
                np.int64(np.floor(df * 1_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES367["nation_balance_gap_welch"] = """
WITH sa AS (
  SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT))
              AS HUGEINT) AS q
  FROM supplier GROUP BY 1
),
ca AS (
  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s,
         CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
              AS HUGEINT) AS q
  FROM customer GROUP BY 1
),
j AS (
  SELECT sa.nk, sa.n AS na, ca.n AS nb,
         (CAST(sa.q AS DOUBLE) - CAST(sa.s AS DOUBLE) * sa.s / sa.n)
           / (sa.n - 1) AS va,
         (CAST(ca.q AS DOUBLE) - CAST(ca.s AS DOUBLE) * ca.s / ca.n)
           / (ca.n - 1) AS vb,
         CAST(sa.s AS DOUBLE) / sa.n AS ma,
         CAST(ca.s AS DOUBLE) / ca.n AS mb
  FROM sa JOIN ca USING (nk)
  WHERE sa.n >= 2 AND ca.n >= 2
),
f AS (
  SELECT nk, na, nb, va, vb,
         (ma - mb) / sqrt(va / na + vb / nb) AS t,
         (va / na + vb / nb) * (va / na + vb / nb)
           / ((va / na) * (va / na) / (na - 1)
              + (vb / nb) * (vb / nb) / (nb - 1)) AS df
  FROM j
  WHERE va > 0 AND vb > 0
)
SELECT CAST(nk AS BIGINT) AS nationkey, na AS n_supp, nb AS n_cust,
       CAST(floor(t * 1000000.0 + 0.5) AS BIGINT) AS t_micro,
       CAST(floor(df * 1000.0 + 0.5) AS BIGINT) AS df_milli
FROM f
ORDER BY nationkey"""


QUERIES367 = {
    "users_gap_weibull_shape": q_users_gap_weibull_shape,
    "nation_balance_gap_welch": q_nation_balance_gap_welch,
}
