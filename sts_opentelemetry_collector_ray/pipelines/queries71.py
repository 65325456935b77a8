"""Driver-contract queries, wave 71 — CUPED variance-reduced A/B readout
(the pre-period covariate adjustment every mature experimentation platform
applies) and discount elasticity of quantity (exact OLS slope — does
discounting actually move volume). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES71: dict[str, str] = {}

_CU_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_ab_cuped — CUPED-adjusted per-arm activity means
# ---------------------------------------------------------------------------


def q_events_ab_cuped(sf_dir: str):
    """CUPED: users hash-assign to two arms (fnv32(user) % 2 — the ab_ztest
    recipe); x = a user's event count in the PRE period (ts ≤ midpoint of
    the global time range), y = the POST count. θ = cov(x,y)/var(x) over all
    users via the EXACT integer n²-scaled sums (n·Σxy − Σx·Σy)/(n·Σx² −
    (Σx)²); each arm reports mean(y) − θ·(mean(x) − mean(x_all)) — the
    variance-reduced readout. Floats only in the final fixed-order
    expressions.

    Scale shape: a tiny global min/max bounds pass (two scalars), then
    per-batch per-user (x, y) partials → ONE user-bucket exchange → exact
    per-user re-reduce folds to per-bucket (arm, n, Σx, Σy, Σxy, Σx²)
    scalars — 2 rows per bucket reach the driver."""
    from ..functions.hashing import fnv1a32_arrow

    path = f"{sf_dir}/events.parquet"
    b = (
        ray.data.read_parquet(path, columns=["ts"])
        .map_batches(
            lambda t: pa.table(
                {
                    "mn": pa.array([pa.compute.min(pa.compute.cast(t["ts"], pa.int64())).as_py()]),
                    "mx": pa.array([pa.compute.max(pa.compute.cast(t["ts"], pa.int64())).as_py()]),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    mid = (int(b["mn"].min()) + int(b["mx"].max())) // 2

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        pre = (ts_us <= mid).astype(np.int64)
        g = (
            pd.DataFrame(
                {"user_id": df["user_id"].to_numpy(np.int64), "x": pre, "y": 1 - pre}
            )
            .groupby("user_id", sort=False)
            .agg(x=("x", "sum"), y=("y", "sum"))
            .reset_index()
        )
        g["_b"] = (g["user_id"].to_numpy(np.int64) % _CU_BUCKETS).astype(np.int64)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby("user_id", sort=False)
            .agg(x=("x", "sum"), y=("y", "sum"))
            .reset_index()
        )
        arm = (
            fnv1a32_arrow(pa.array(m["user_id"].astype(str))) % np.uint64(2)
        ).astype(np.int64)
        x = m["x"].to_numpy(np.int64)
        y = m["y"].to_numpy(np.int64)
        rows = []
        for a in (0, 1):
            sel = arm == a
            rows.append(
                (
                    a,
                    int(sel.sum()),
                    int(x[sel].sum()),
                    int(y[sel].sum()),
                    int((x[sel].astype(object) * y[sel].astype(object)).sum() or 0),
                    int((x[sel].astype(object) * x[sel].astype(object)).sum() or 0),
                )
            )
        return pd.DataFrame(
            {
                "arm": np.array([r[0] for r in rows], np.int64),
                "n": np.array([r[1] for r in rows], np.int64),
                "sx": np.array([r[2] for r in rows], np.int64),
                "sy": np.array([r[3] for r in rows], np.int64),
                "sxy": np.array([r[4] for r in rows], np.int64),
                "sx2": np.array([r[5] for r in rows], np.int64),
            }
        )

    parts = (
        ray.data.read_parquet(path, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # bounded: 2 rows per bucket
        .groupby("arm")
        .agg(n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
             sxy=("sxy", "sum"), sx2=("sx2", "sum"))
    )
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    sy = int(parts["sy"].sum())
    sxy = int(parts["sxy"].sum())
    sx2 = int(parts["sx2"].sum())
    den = n * sx2 - sx * sx
    theta = float(n * sxy - sx * sy) / float(den) if den else 0.0
    rows = []
    for a in (0, 1):
        if a not in parts.index or int(parts.loc[a, "n"]) == 0:
            continue  # SQL emits only arms that exist
        na = int(parts.loc[a, "n"])
        sax = int(parts.loc[a, "sx"])
        say = int(parts.loc[a, "sy"])
        adj = (say / na) - theta * ((sax / na) - (sx / n))
        rows.append((a, na, sax, say, adj))
    return pd.DataFrame(
        {
            "arm": np.array([r[0] for r in rows], np.int64),
            "n_users": np.array([r[1] for r in rows], np.int64),
            "sum_pre": np.array([r[2] for r in rows], np.int64),
            "sum_post": np.array([r[3] for r in rows], np.int64),
            "theta_micro": np.full(
                len(rows), np.int64(np.floor(theta * 1e6 + 0.5))
            ),
            "adj_mean_micro": np.array(
                [np.int64(np.floor(r[4] * 1e6 + 0.5)) for r in rows], np.int64
            ),
        }
    )


def _cuped_oracle() -> str:
    from .queries10 import _fnv32_sql

    arm = f"{_fnv32_sql('CAST(user_id AS VARCHAR)')} % 2"
    return f"""
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
u AS (
  SELECT user_id,
         CAST(count(*) FILTER (epoch_us(ts) <= b.mid) AS BIGINT) AS x,
         CAST(count(*) FILTER (epoch_us(ts) > b.mid) AS BIGINT) AS y
  FROM events CROSS JOIN b GROUP BY user_id, b.mid
),
ua AS (SELECT *, CAST({arm} AS BIGINT) AS arm FROM u),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2
  FROM ua
),
th AS (
  SELECT CASE WHEN n * sx2 - sx * sx = 0 THEN 0.0
              ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sx2 - sx * sx AS DOUBLE) END AS theta,
         n, sx
  FROM tot
),
pa_ AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS sum_pre,
         CAST(sum(y) AS BIGINT) AS sum_post
  FROM ua GROUP BY arm
)
SELECT pa_.arm, pa_.n_users, pa_.sum_pre, pa_.sum_post,
       CAST(floor(th.theta * 1000000 + 0.5) AS BIGINT) AS theta_micro,
       CAST(floor(((pa_.sum_post / (pa_.n_users * 1.0))
                   - th.theta * ((pa_.sum_pre / (pa_.n_users * 1.0))
                                 - (CAST(th.sx AS DOUBLE) / CAST(th.n AS DOUBLE))))
                  * 1000000 + 0.5) AS BIGINT) AS adj_mean_micro
FROM pa_, th ORDER BY pa_.arm"""


ORACLES71["events_ab_cuped"] = _cuped_oracle()


# ---------------------------------------------------------------------------
# lineitem_discount_elasticity — exact OLS slope of quantity on discount
# ---------------------------------------------------------------------------


def q_lineitem_discount_elasticity(sf_dir: str):
    """Elasticity screen: OLS slope of l_quantity on discount percent over
    all lineitems — slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) from EXACT
    integer sums (x = discount pct, y = whole-unit quantity), one float
    division, micro-floored. Positive slope = discounts move volume.

    Scale shape: 5 integer scalars per block, zero shuffles."""

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        y = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)]),
                "sx": pa.array([int(x.sum())]),
                "sy": pa.array([int(y.sum())]),
                "sxy": pa.array([int((x * y).sum())]),
                "sx2": pa.array([int((x * x).sum())]),
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one row per block
    )
    n = sum(int(v) for v in p["n"])
    sx = sum(int(v) for v in p["sx"])
    sy = sum(int(v) for v in p["sy"])
    sxy = sum(int(v) for v in p["sxy"])
    sx2 = sum(int(v) for v in p["sx2"])
    den = n * sx2 - sx * sx
    slope = float(n * sxy - sx * sy) / float(den) if den else 0.0
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "slope_micro": [np.int64(np.floor(slope * 1e6 + 0.5))],
        }
    )


ORACLES71["lineitem_discount_elasticity"] = """
WITH c AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS HUGEINT) AS x,
         CAST(l_quantity AS HUGEINT) AS y
  FROM lineitem
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sx2
  FROM c
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(CASE WHEN n * sx2 - sx * sx = 0 THEN 0.0
                       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sx2 - sx * sx AS DOUBLE)
                  END * 1000000 + 0.5) AS BIGINT) AS slope_micro
FROM s"""


QUERIES71 = {
    "events_ab_cuped": q_events_ab_cuped,
    "lineitem_discount_elasticity": q_lineitem_discount_elasticity,
}
