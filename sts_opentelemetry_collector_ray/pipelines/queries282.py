"""Driver-contract queries, wave 282 — absorbing-Markov expected steps
to absorption for the top-3 event-type chain (closed-form 2x2
fundamental matrix, exact integer counts) and the experience/learning
curve: log-log elasticity of unit price on cumulative ordered quantity
per part brand. Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES282: dict[str, str] = {}

_AB_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_absorbing_markov — expected steps to absorption (2x2 closed form)
# ---------------------------------------------------------------------------


def q_events_absorbing_markov(sf_dir: str):
    """Absorbing-chain analysis of the top-3 event-type transition
    matrix (per-user consecutive transitions, the `events_stuart_maxwell`
    machinery): the 3rd type is declared absorbing, Q is the 2x2
    transition-probability block among types 1-2 (q_ij = n_ij / r_i from
    EXACT integer counts), and the fundamental matrix N = (I-Q)^-1
    yields expected steps to absorption t = N 1 in closed form:
    t1 = (1 - q22 + q12) / det, t2 = (1 - q11 + q21) / det with
    det = (1-q11)(1-q22) - q12 q21. One row: type_a, type_b, type_c,
    r1, r2, t1_micro, t2_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries273 import (
        q_events_stuart_maxwell,  # noqa: F401  (shared machinery cited)
    )

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
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df["_b"] = (df["u"] % _AB_BUCKETS).astype(np.int64)
        return df

    def count_partial(t: pa.Table) -> pd.DataFrame:
        g = pd.Series(
            t["event_type"].to_numpy(zero_copy_only=False)
        ).value_counts()
        return pd.DataFrame(
            {"et": g.index.to_numpy(object), "c": g.to_numpy(np.int64)}
        )

    totals = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("et")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "et"], ascending=[False, True])
    )
    cols = ["type_a", "type_b", "type_c", "r1", "r2", "t1_micro", "t2_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:3]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[3:]},
        }
    )
    if len(totals) < 3:
        return empty
    top3 = totals["et"].tolist()[:3]
    ta, tb, tc = top3
    top_set = set(top3)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {
                "f": pd.Series([], dtype=object),
                "t": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        g = g[g["et"].isin(top_set)]
        if len(g) == 0:
            return empty_m
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy()
        et = g["et"].to_numpy(object)
        same = u[1:] == u[:-1]
        f, t = et[:-1][same], et[1:][same]
        if len(f) == 0:
            return empty_m
        out = (
            pd.DataFrame({"f": f, "t": t})
            .groupby(["f", "t"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    mat = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["f", "t"])["c"]
        .sum()
    )
    if mat.empty:
        return empty
    n = {(x, z): int(mat.get((x, z), 0)) for x in top3 for z in top3}
    r1 = n[(ta, ta)] + n[(ta, tb)] + n[(ta, tc)]
    r2 = n[(tb, ta)] + n[(tb, tb)] + n[(tb, tc)]
    if r1 == 0 or r2 == 0:
        return empty
    q11 = float(n[(ta, ta)]) / float(r1)
    q12 = float(n[(ta, tb)]) / float(r1)
    q21 = float(n[(tb, ta)]) / float(r2)
    q22 = float(n[(tb, tb)]) / float(r2)
    det = (1.0 - q11) * (1.0 - q22) - q12 * q21
    if det <= 0.0:
        return empty
    t1 = (1.0 - q22 + q12) / det
    t2 = (1.0 - q11 + q21) / det
    return pd.DataFrame(
        [
            (
                ta, tb, tc, np.int64(r1), np.int64(r2),
                np.int64(np.floor(t1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(t2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[3:]})


ORACLES282["events_absorbing_markov"] = """
WITH tc AS (
  SELECT event_type, row_number() OVER (ORDER BY count(*) DESC, event_type)
           AS rk
  FROM events GROUP BY 1
),
top3 AS (SELECT event_type, rk FROM tc WHERE rk <= 3),
seq AS (
  SELECT e.event_type AS f,
         lead(e.event_type) OVER (
           PARTITION BY e.user_id ORDER BY e.ts, e.event_id
         ) AS t
  FROM events e JOIN top3 ON top3.event_type = e.event_type
),
m AS (
  SELECT f, t, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE t IS NOT NULL GROUP BY 1, 2
),
get AS (
  SELECT
    (SELECT event_type FROM top3 WHERE rk = 1) AS e1,
    (SELECT event_type FROM top3 WHERE rk = 2) AS e2,
    (SELECT event_type FROM top3 WHERE rk = 3) AS e3
),
cnt AS (
  SELECT
    CAST(coalesce((SELECT c FROM m, get WHERE f = e1 AND t = e1), 0)
         AS BIGINT) AS n11,
    CAST(coalesce((SELECT c FROM m, get WHERE f = e1 AND t = e2), 0)
         AS BIGINT) AS n12,
    CAST(coalesce((SELECT c FROM m, get WHERE f = e1 AND t = e3), 0)
         AS BIGINT) AS n13,
    CAST(coalesce((SELECT c FROM m, get WHERE f = e2 AND t = e1), 0)
         AS BIGINT) AS n21,
    CAST(coalesce((SELECT c FROM m, get WHERE f = e2 AND t = e2), 0)
         AS BIGINT) AS n22,
    CAST(coalesce((SELECT c FROM m, get WHERE f = e2 AND t = e3), 0)
         AS BIGINT) AS n23
),
q AS (
  SELECT n11 + n12 + n13 AS r1, n21 + n22 + n23 AS r2,
         CAST(n11 AS DOUBLE) / (n11 + n12 + n13) AS q11,
         CAST(n12 AS DOUBLE) / (n11 + n12 + n13) AS q12,
         CAST(n21 AS DOUBLE) / (n21 + n22 + n23) AS q21,
         CAST(n22 AS DOUBLE) / (n21 + n22 + n23) AS q22
  FROM cnt
  WHERE n11 + n12 + n13 > 0 AND n21 + n22 + n23 > 0
),
s AS (
  SELECT r1, r2,
         (1.0 - q11) * (1.0 - q22) - q12 * q21 AS det,
         q11, q12, q21, q22
  FROM q
)
SELECT get.e1 AS type_a, get.e2 AS type_b, get.e3 AS type_c,
       s.r1, s.r2,
       CAST(floor((1.0 - s.q22 + s.q12) / s.det * 1000000.0 + 0.5)
            AS BIGINT) AS t1_micro,
       CAST(floor((1.0 - s.q11 + s.q21) / s.det * 1000000.0 + 0.5)
            AS BIGINT) AS t2_micro
FROM s, get
WHERE s.det > 0 AND (SELECT count(*) FROM top3) >= 3"""


# ---------------------------------------------------------------------------
# lineitem_learning_curve — log-log price-on-cumulative-volume per brand
# ---------------------------------------------------------------------------


def q_lineitem_learning_curve(sf_dir: str):
    """Experience-curve elasticity per part brand: lineitems ordered by
    (shipdate, orderkey, linenumber) within brand, x = ln(cumulative
    quantity inclusive), y = ln(extendedprice / quantity); the per-brand
    OLS slope is the learning elasticity (progress ratio 2^slope). Per
    brand: brand, n, slope_micro, intercept_milli.

    Scale shape: the partkey->brand map broadcasts via ray.put; rows
    ride ONE bounded brand-bucket exchange and each brand folds with a
    vectorized lexsort + cumsum (|brands| is a bounded dimension)."""
    import ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = ray.put(p2b)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2b_ = ray.get(dims_ref)
        df = pd.DataFrame(
            {
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ok": t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "ln_": t["l_linenumber"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "sd": t["l_shipdate"].to_pandas().to_numpy(
                    "datetime64[us]"
                ).astype(np.int64),
                "q": np.floor(
                    t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0
                    + 0.5
                ).astype(np.int64),
                "p": t["l_extendedprice"].to_numpy(zero_copy_only=False),
                "qty": t["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        df["brand"] = df["pk"].map(p2b_)
        return df.drop(columns=["pk"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {
                "brand": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "sx": pd.Series([], dtype=np.float64),
                "sy": pd.Series([], dtype=np.float64),
                "sxx": pd.Series([], dtype=np.float64),
                "sxy": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty_m
        rows = []
        for brand, sub in g.groupby("brand", sort=False):
            sub = sub.sort_values(["sd", "ok", "ln_"], kind="stable")
            cum = np.cumsum(sub["q"].to_numpy(np.int64))
            x = np.log(cum.astype(np.float64) / 1000.0)
            y = np.log(
                sub["p"].to_numpy(np.float64) / sub["qty"].to_numpy(np.float64)
            )
            rows.append(
                (
                    brand, np.int64(len(sub)), float(x.sum()), float(y.sum()),
                    float((x * x).sum()), float((x * y).sum()),
                )
            )
        return pd.DataFrame(
            rows, columns=["brand", "n", "sx", "sy", "sxx", "sxy"]
        )

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
                "l_quantity", "l_extendedprice",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("brand")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("brand")[["n", "sx", "sy", "sxx", "sxy"]]
        .sum()
        .sort_index()
    )
    cols = ["brand", "n", "slope_micro", "intercept_milli"]
    empty = pd.DataFrame(
        {
            "brand": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    rows = []
    for brand, r in m.iterrows():
        n = float(int(r["n"]))
        if n < 2:
            continue
        den = n * r["sxx"] - r["sx"] * r["sx"]
        if den == 0.0:
            continue
        slope = (n * r["sxy"] - r["sx"] * r["sy"]) / den
        intercept = (r["sy"] - slope * r["sx"]) / n
        rows.append(
            (
                brand, np.int64(int(r["n"])),
                np.int64(np.floor(slope * 1_000_000.0 + 0.5)),
                np.int64(np.floor(intercept * 1_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES282["lineitem_learning_curve"] = """
WITH base AS (
  SELECT p.p_brand AS brand,
         ln(CAST(sum(CAST(floor(l.l_quantity * 1000.0 + 0.5) AS BIGINT))
                 OVER (PARTITION BY p.p_brand
                       ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber)
                 AS DOUBLE) / 1000.0) AS x,
         ln(l.l_extendedprice / l.l_quantity) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM base GROUP BY 1
)
SELECT brand, n,
       CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                  * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
       CAST(floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                  * 1000.0 + 0.5) AS BIGINT) AS intercept_milli
FROM m
WHERE n >= 2 AND (n * sxx - sx * sx) <> 0
ORDER BY brand"""


QUERIES282 = {
    "events_absorbing_markov": q_events_absorbing_markov,
    "lineitem_learning_curve": q_lineitem_learning_curve,
}
