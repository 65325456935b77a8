"""Driver-contract queries, wave 321 — brand lifecycle classification
(growth / flat / decline census from per-brand monthly volume trends)
and user temporal-regularity classes (regular / random / bursty from
per-user interarrival CV^2). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES321: dict[str, str] = {}

_TC_BUCKETS = 64


# ---------------------------------------------------------------------------
# part_brand_lifecycle — growth/flat/decline census of brand volumes
# ---------------------------------------------------------------------------


def q_part_brand_lifecycle(sf_dir: str):
    """Lifecycle census: per brand the OLS slope of monthly shipped
    quantity (milli) on month index, classified by the t-like ratio
    slope / se: growth (t > 2), decline (t < -2), else flat. Moment
    cores are exact integers; slope, residual SE and the ratio are
    mirrored float. Per class: lifecycle, n_brands, share_micro.

    Scale shape: (brand, month) quantity fold via the broadcast
    part->brand map; \|brands\| regressions on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        df = t.to_pandas()
        ym = (
            df["l_shipdate"].dt.year.to_numpy(np.int64) * 12
            + df["l_shipdate"].dt.month.to_numpy(np.int64) - 1
        )
        q = np.floor(
            df["l_quantity"].to_numpy(np.float64) * 1000.0 + 0.5
        ).astype(np.int64)
        brand = df["l_partkey"].map(p2b_).to_numpy(object)
        g = (
            pd.DataFrame({"brand": brand, "ym": ym, "q": q})
            .groupby(["brand", "ym"], as_index=False)["q"]
            .sum()
        )
        return g.astype({"ym": np.int64, "q": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["brand", "ym"])["q"]
        .sum()
        .reset_index()
    )
    cols = ["lifecycle", "n_brands", "share_micro"]
    empty = pd.DataFrame(
        {
            "lifecycle": pd.Series([], dtype=object),
            "n_brands": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if m.empty:
        return empty
    ym0 = int(m["ym"].min())
    counts = {"growth": 0, "flat": 0, "decline": 0}
    for brand, sub in m.groupby("brand"):
        # zero-fill the brand's month range over the GLOBAL calendar
        t = sub["ym"].to_numpy(np.int64) - ym0
        y = sub["q"].to_numpy(np.int64)
        n = len(t)
        if n < 3:
            counts["flat"] += 1
            continue
        to, yo = t.astype(object), y.astype(object)
        sx, sy = int(to.sum()), int(yo.sum())
        sxx = int((to * to).sum())
        sxy = int((to * yo).sum())
        syy = int((yo * yo).sum())
        den = n * sxx - sx * sx
        if den == 0:
            counts["flat"] += 1
            continue
        slope = float(n * sxy - sx * sy) / float(den)
        sse = (
            float(n * syy - sy * sy)
            - float(n * sxy - sx * sy) ** 2 / float(den)
        ) / float(n)
        if n <= 2 or sse <= 0.0:
            counts["flat"] += 1
            continue
        se = float(np.sqrt(sse * float(n) / float(n - 2) / float(den) * n))
        tstat = slope / se if se > 0.0 else 0.0
        if tstat > 2.0:
            counts["growth"] += 1
        elif tstat < -2.0:
            counts["decline"] += 1
        else:
            counts["flat"] += 1
    total = sum(counts.values())
    if total == 0:
        return empty
    rows = []
    for k in ("decline", "flat", "growth"):
        rows.append(
            (
                k, np.int64(counts[k]),
                np.int64(np.floor(
                    float(counts[k]) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_brands": np.int64, "share_micro": np.int64}
    )


ORACLES321["part_brand_lifecycle"] = """
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS BIGINT)
           AS ym,
         CAST(floor(l.l_quantity * 1000.0 + 0.5) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g0 AS (SELECT min(ym) AS ym0 FROM base),
mth AS (
  SELECT brand, ym - g0.ym0 AS t, CAST(sum(q) AS BIGINT) AS y
  FROM base, g0 GROUP BY 1, 2
),
mom AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx,
         CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM mth GROUP BY 1
),
fit AS (
  SELECT brand, n,
         CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
              AS DOUBLE) AS den,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              AS DOUBLE) AS num,
         CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
              AS DOUBLE) AS cyy
  FROM mom
),
cls AS (
  SELECT brand,
         CASE WHEN n < 3 OR den = 0 THEN 'flat'
              WHEN (cyy - num * num / den) / n <= 0 THEN 'flat'
              WHEN (num / den)
                   / sqrt((cyy - num * num / den) / n * n / (n - 2)
                          / den * n) > 2.0 THEN 'growth'
              WHEN (num / den)
                   / sqrt((cyy - num * num / den) / n * n / (n - 2)
                          / den * n) < -2.0 THEN 'decline'
              ELSE 'flat' END AS lifecycle
  FROM fit
),
h AS (
  SELECT lifecycle, CAST(count(*) AS BIGINT) AS n_brands FROM cls
  GROUP BY 1
),
tot AS (SELECT CAST(sum(n_brands) AS BIGINT) AS t FROM h),
classes AS (
  SELECT unnest(['decline', 'flat', 'growth']) AS lifecycle
)
SELECT c.lifecycle,
       CAST(coalesce(h.n_brands, 0) AS BIGINT) AS n_brands,
       CAST(floor(CAST(coalesce(h.n_brands, 0) AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro
FROM classes c LEFT JOIN h USING (lifecycle), tot
WHERE tot.t > 0
ORDER BY c.lifecycle"""


# ---------------------------------------------------------------------------
# users_temporal_classes — regularity census from interarrival CV^2
# ---------------------------------------------------------------------------


def q_users_temporal_classes(sf_dir: str):
    """Temporal-regularity census: per user with >= 3 events the
    interarrival CV^2 (population, exact gap moments) classifies the
    user as regular (CV^2 decided by EXACT integer cross-multiplication
    against 1/2), random (1/2 <= CV^2 < 3/2) or bursty (CV^2 >= 3/2).
    Per class: temporal_class, n_users, share_micro.

    Scale shape: ONE user-bucket exchange; per-bucket vectorized sort +
    same-user gap moments; each bucket emits its 3-cell census."""

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
        df["_b"] = (df["u"] % _TC_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "cls": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["u", "ts", "eid"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        gu = u[1:][same]
        per = pd.DataFrame({"u": gu, "d": gaps}).groupby("u")["d"].agg(
            m="size", s="sum",
            s2=lambda x: int(
                (x.to_numpy(np.int64).astype(object)
                 * x.to_numpy(np.int64).astype(object)).sum()
            ),
        )
        per = per[per["m"] >= 2]  # >= 3 events
        if len(per) == 0:
            return zero
        rows = {"regular": 0, "random": 0, "bursty": 0}
        for _, r in per.iterrows():
            m, s, s2 = int(r["m"]), int(r["s"]), int(r["s2"])
            # CV^2 = (m s2 - s^2) / s^2; compare to 1/2 and 3/2 exactly
            num = m * s2 - s * s
            if 2 * num < s * s:
                rows["regular"] += 1
            elif 2 * num < 3 * s * s:
                rows["random"] += 1
            else:
                rows["bursty"] += 1
        return pd.DataFrame(
            {
                "cls": list(rows.keys()),
                "n": np.array(list(rows.values()), np.int64),
            }
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("cls")["n"]
        .sum()
    )
    cols = ["temporal_class", "n_users", "share_micro"]
    empty = pd.DataFrame(
        {
            "temporal_class": pd.Series([], dtype=object),
            "n_users": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if h.empty:
        return empty
    total = int(h.sum())
    rows = []
    for k in ("bursty", "random", "regular"):
        n = int(h.get(k, 0))
        rows.append(
            (
                k, np.int64(n),
                np.int64(np.floor(
                    float(n) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_users": np.int64, "share_micro": np.int64}
    )


ORACLES321["users_temporal_classes"] = """
WITH s AS (
  SELECT user_id,
         epoch_us(ts)
           - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS d
  FROM events
),
gaps AS (SELECT user_id, CAST(d AS BIGINT) AS d FROM s WHERE d IS NOT NULL),
per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS s2
  FROM gaps GROUP BY 1
  HAVING count(*) >= 2
),
cls AS (
  SELECT CASE
           WHEN 2 * (m * s2 - CAST(sd AS HUGEINT) * sd)
                < CAST(sd AS HUGEINT) * sd THEN 'regular'
           WHEN 2 * (m * s2 - CAST(sd AS HUGEINT) * sd)
                < 3 * (CAST(sd AS HUGEINT) * sd) THEN 'random'
           ELSE 'bursty' END AS temporal_class
  FROM per
),
h AS (
  SELECT temporal_class, CAST(count(*) AS BIGINT) AS n_users
  FROM cls GROUP BY 1
),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS t FROM h),
classes AS (
  SELECT unnest(['bursty', 'random', 'regular']) AS temporal_class
)
SELECT c.temporal_class,
       CAST(coalesce(h.n_users, 0) AS BIGINT) AS n_users,
       CAST(floor(CAST(coalesce(h.n_users, 0) AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro
FROM classes c LEFT JOIN h USING (temporal_class), tot
WHERE tot.t > 0
ORDER BY c.temporal_class"""


QUERIES321 = {
    "part_brand_lifecycle": q_part_brand_lifecycle,
    "users_temporal_classes": q_users_temporal_classes,
}
