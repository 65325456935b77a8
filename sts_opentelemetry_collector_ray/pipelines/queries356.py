"""Driver-contract queries, wave 356 — Sarle's bimodality coefficient
over per-user mean event values (are there two user populations?) and
the quantity-to-ship-latency correlation (do big lines ship slower?).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES356: dict[str, str] = {}

_VB_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_value_bimodality — Sarle's coefficient on user mean values
# ---------------------------------------------------------------------------


def q_users_value_bimodality(sf_dir: str):
    """Two populations? Per user the mean event value (cents sum /
    count, an exact rational evaluated once in float); over users the
    sample skewness g1 and excess kurtosis g2, and Sarle's
    b = (g1^2 + 1) / (g2 + 3) — b > 5/9 hints bimodality. One row:
    n_users, skew_micro, exkurt_micro, bc_micro, suspicious.

    Scale shape: per-user (n, cents) reduce on a user-bucket exchange;
    the four mean-moments fold as floats of exact rationals."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"u": u, "n": 1, "s": cents})
            .groupby("u", as_index=False)
            .sum()
        )
        g["_b"] = (g["u"].to_numpy(np.int64) % _VB_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")[["n", "s"]].sum()
        m = per["s"].to_numpy(np.int64).astype(np.float64) / per[
            "n"
        ].to_numpy(np.int64).astype(np.float64)
        return pd.DataFrame(
            {
                "k": [np.int64(len(per))],
                "s1": [float(m.sum())],
                "s2": [float((m * m).sum())],
                "s3": [float((m * m * m).sum())],
                "s4": [float((m * m * m * m).sum())],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_users", "skew_micro", "exkurt_micro", "bc_micro",
            "suspicious"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    k = int(p["k"])
    if k < 4:
        return empty
    s1, s2, s3, s4 = (
        float(p["s1"]), float(p["s2"]), float(p["s3"]), float(p["s4"])
    )
    kf = float(k)
    mu = s1 / kf
    m2 = s2 / kf - mu * mu
    if m2 <= 0.0:
        return empty
    m3 = s3 / kf - 3.0 * mu * s2 / kf + 2.0 * mu * mu * mu
    m4 = (
        s4 / kf - 4.0 * mu * s3 / kf + 6.0 * mu * mu * s2 / kf
        - 3.0 * mu * mu * mu * mu
    )
    g1 = m3 / (m2 * np.sqrt(m2))
    g2 = m4 / (m2 * m2) - 3.0
    bc = (g1 * g1 + 1.0) / (g2 + 3.0)
    return pd.DataFrame(
        [
            (
                np.int64(k),
                np.int64(np.floor(g1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(g2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(bc * 1_000_000.0 + 0.5)),
                np.int64(1 if bc > 5.0 / 9.0 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES356["users_value_bimodality"] = """
WITH per AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / count(*) AS m
  FROM events GROUP BY 1
),
mm AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(m) AS s1, sum(m * m) AS s2,
         sum(m * m * m) AS s3, sum(m * m * m * m) AS s4
  FROM per
),
c AS (
  SELECT k, s1 / k AS mu, s2 / k - (s1 / k) * (s1 / k) AS m2,
         s1, s2, s3, s4
  FROM mm WHERE k >= 4
),
sh AS (
  SELECT k, m2,
         s3 / k - 3.0 * mu * s2 / k + 2.0 * mu * mu * mu AS m3,
         s4 / k - 4.0 * mu * s3 / k + 6.0 * mu * mu * s2 / k
           - 3.0 * mu * mu * mu * mu AS m4
  FROM c WHERE m2 > 0
),
st AS (
  SELECT k, m3 / (m2 * sqrt(m2)) AS g1, m4 / (m2 * m2) - 3.0 AS g2
  FROM sh
)
SELECT k AS n_users,
       CAST(floor(g1 * 1000000.0 + 0.5) AS BIGINT) AS skew_micro,
       CAST(floor(g2 * 1000000.0 + 0.5) AS BIGINT) AS exkurt_micro,
       CAST(floor((g1 * g1 + 1.0) / (g2 + 3.0) * 1000000.0 + 0.5)
            AS BIGINT) AS bc_micro,
       CAST(CASE WHEN (g1 * g1 + 1.0) / (g2 + 3.0) > 5.0 / 9.0
                 THEN 1 ELSE 0 END AS BIGINT) AS suspicious
FROM st"""


# ---------------------------------------------------------------------------
# lineitem_latency_quantity_corr — do big lines ship slower?
# ---------------------------------------------------------------------------


def q_lineitem_latency_quantity_corr(sf_dir: str):
    """Operational correlation: x = quantity (milli), y = ship latency
    days (shipdate - orderdate, needs the tagged orderkey exchange);
    Pearson r and slope from EXACT integer moments. One row: n,
    r_micro, slope_micro (milli-days per quantity-milli)."""

    def li_rows(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        k = df["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "q": np.floor(
                    df["l_quantity"].to_numpy(np.float64) * 1000.0 + 0.5
                ).astype(np.int64),
                "sd": df["l_shipdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // 86_400_000_000,
                "od": np.int64(-1),
                "_b": (k % _VB_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        k = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "q": np.int64(-1),
                "sd": np.int64(-1),
                "od": df["o_orderdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // 86_400_000_000,
                "_b": (k % _VB_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {c: pd.Series([], dtype=object)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        )
        li = g[g["od"] < 0][["k", "q", "sd"]]
        o = g[g["od"] >= 0][["k", "od"]]
        m = li.merge(o, on="k")
        if len(m) == 0:
            return zero
        x = m["q"].to_numpy(np.int64).astype(object)
        y = (m["sd"].to_numpy(np.int64)
             - m["od"].to_numpy(np.int64)).astype(object)
        return pd.DataFrame(
            {
                "n": [len(x)], "sx": [int(x.sum())], "sy": [int(y.sum())],
                "sxx": [int((x * x).sum())], "syy": [int((y * y).sum())],
                "sxy": [int((x * y).sum())],
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_shipdate"],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    p = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n", "r_micro", "slope_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if p.empty:
        return empty
    n = int(sum(int(v) for v in p["n"]))
    if n < 3:
        return empty
    sx = int(sum(int(v) for v in p["sx"]))
    sy = int(sum(int(v) for v in p["sy"]))
    sxx = int(sum(int(v) for v in p["sxx"]))
    syy = int(sum(int(v) for v in p["syy"]))
    sxy = int(sum(int(v) for v in p["sxy"]))
    cx = n * sxx - sx * sx
    cy = n * syy - sy * sy
    if cx <= 0 or cy <= 0:
        return empty
    r = float(n * sxy - sx * sy) / (
        float(np.sqrt(float(cx))) * float(np.sqrt(float(cy)))
    )
    slope = float(n * sxy - sx * sy) / float(cx) * 1_000.0
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
                np.int64(np.floor(slope * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES356["lineitem_latency_quantity_corr"] = """
WITH base AS (
  SELECT CAST(floor(l.l_quantity * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(epoch_us(l.l_shipdate) // 86400000000
              - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS y
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM base
)
SELECT n,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                     * sqrt(CAST(CAST(n AS HUGEINT) * syy
                                 - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS r_micro,
       CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * 1000.0 * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
FROM m
WHERE n >= 3
  AND (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
  AND (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0"""


QUERIES356 = {
    "users_value_bimodality": q_users_value_bimodality,
    "lineitem_latency_quantity_corr": q_lineitem_latency_quantity_corr,
}
