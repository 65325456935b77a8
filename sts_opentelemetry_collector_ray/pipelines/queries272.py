"""Driver-contract queries, wave 272 — the AMS (Alon-Matias-Szegedy)
F2 sketch over user event frequencies vs the exact second moment
(deterministic FNV-derived sign vectors, exact integer estimates), and
Page's L trend test for an ordered weekday effect within calendar-week
blocks (exact doubled ranks). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES272: dict[str, str] = {}

_DAY_US = 86_400_000_000
_AMS_K = 16
_AMS_BUCKETS = 64

_FNV32_SIGN = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(CAST({j} AS VARCHAR) || ':' "
    "|| CAST(user_id AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 2"
)


# ---------------------------------------------------------------------------
# events_ams_f2 — AMS second-moment sketch vs exact F2
# ---------------------------------------------------------------------------


def q_events_ams_f2(sf_dir: str):
    """AMS F2 sketch: 16 deterministic sign vectors
    s_j(u) = 1 - 2*(fnv1a32(j || ':' || u) mod 2); each estimator is
    Z_j = sum_u s_j(u) f_u (EXACT integer — linear in counts) and
    est_j = Z_j^2; the sketch answer is the LOWER median of the 16
    estimates, compared against the exact F2 = sum f_u^2. Per
    estimator: j, z_j, est_j, f2_exact, med_est, rel_err_micro (last
    three repeated).

    Scale shape: per-batch (user -> count) partials ride ONE
    user-bucket exchange; each bucket emits 18 scalars (16 sign-sums +
    f2 + n), so the driver folds buckets x scalars — frequencies never
    leave the workers."""
    from ..functions.hashing import fnv1a32_arrow

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        out = pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "f": g.to_numpy(np.int64)}
        )
        out["_b"] = (out["u"] % _AMS_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("u")["f"].sum()
        u = gg.index.to_numpy(np.int64)
        f = gg.to_numpy(np.int64)
        row = {"f2": np.int64(int((f.astype(object) * f.astype(object)).sum()))}
        for j in range(_AMS_K):
            keys = pa.array([f"{j}:{int(x)}" for x in u], pa.string())
            h = fnv1a32_arrow(keys)
            sign = 1 - 2 * (h.astype(np.int64) & 1)
            row[f"z{j}"] = np.int64(int((sign * f).sum()))
        return pd.DataFrame([row])

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["j", "z_j", "est_j", "f2_exact", "med_est", "rel_err_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    f2 = int(parts["f2"])
    if f2 == 0:
        return empty
    zs = [int(parts[f"z{j}"]) for j in range(_AMS_K)]
    ests = [z * z for z in zs]
    med = sorted(ests)[(_AMS_K - 1) // 2]  # lower median
    rel = float(abs(med - f2)) / float(f2)
    rm = np.int64(np.floor(rel * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        [
            (
                np.int64(j), np.int64(zs[j]), np.int64(ests[j]),
                np.int64(f2), np.int64(med), rm,
            )
            for j in range(_AMS_K)
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _ams_oracle() -> str:
    sign_cases = ",\n".join(
        f"         1 - 2 * ({_FNV32_SIGN.format(j=j)}) AS s{j}"
        for j in range(_AMS_K)
    )
    z_cols = ",\n".join(
        f"         CAST(sum(s.s{j} * f.f) AS BIGINT) AS z{j}"
        for j in range(_AMS_K)
    )
    est_rows = "\n  UNION ALL ".join(
        f"SELECT {j} AS j, z{j} AS z_j, z{j} * z{j} AS est_j FROM z"
        for j in range(_AMS_K)
    )
    return f"""
WITH f AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS f
  FROM events GROUP BY 1
),
s AS (
  SELECT user_id,
{sign_cases}
  FROM f
),
z AS (
  SELECT
{z_cols},
         CAST(sum(f.f * f.f) AS BIGINT) AS f2
  FROM f JOIN s USING (user_id)
),
est AS (
  {est_rows}
),
med AS (
  SELECT est_j AS m FROM est ORDER BY est_j LIMIT 1 OFFSET {(_AMS_K - 1) // 2}
)
SELECT CAST(est.j AS BIGINT) AS j, CAST(est.z_j AS BIGINT) AS z_j,
       CAST(est.est_j AS BIGINT) AS est_j,
       z.f2 AS f2_exact, CAST(med.m AS BIGINT) AS med_est,
       CAST(floor(CAST(abs(med.m - z.f2) AS DOUBLE) / CAST(z.f2 AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rel_err_micro
FROM est, z, med
WHERE z.f2 > 0
ORDER BY est.j"""


# ---------------------------------------------------------------------------
# events_page_trend — Page's L for ordered weekday effects
# ---------------------------------------------------------------------------


def q_events_page_trend(sf_dir: str):
    """Page's L test with calendar-week blocks (epoch-week = dy // 7,
    complete 7-day blocks only) and weekday slot order 0..6 as the
    ordered treatments: within each block the daily counts get doubled
    average ranks R2 = 2*below + ties + 1 (EXACT integers) and
    L2 = sum (slot+1) * R2 = 2L. Under H0 E[L] = 112 b and
    Var[L] = 392 b / 3 (k=7); z is the single float step. One row:
    n_blocks, l2_stat, e_l, z_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_blocks", "l2_stat", "e_l", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    d0 = int(days.index.min())
    dy = d0 + np.arange(len(y), dtype=np.int64)
    df = pd.DataFrame({"wk": dy // 7, "slot": dy % 7, "y": y})
    sizes = df.groupby("wk")["wk"].transform("size")
    df = df[sizes == 7]
    b = df["wk"].nunique()
    if b < 1:
        return empty
    r2 = (df.groupby("wk")["y"].rank(method="average") * 2).astype(np.int64)
    l2 = int(((df["slot"].to_numpy(np.int64) + 1) * r2.to_numpy(np.int64)).sum())
    e_l = 112 * b
    var = 392.0 * float(b) / 3.0
    z = (float(l2) / 2.0 - float(e_l)) / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(b), np.int64(l2), np.int64(e_l),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES272["events_page_trend"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy // 7 AS wk, grid.dy % 7 AS slot,
         CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
full_wk AS (
  SELECT wk FROM x GROUP BY wk HAVING count(*) = 7
),
ranked AS (
  SELECT x.wk, x.slot, x.y,
         2 * (rank() OVER (PARTITION BY x.wk ORDER BY x.y))
           + (count(*) OVER (PARTITION BY x.wk, x.y)) - 1 AS r2
  FROM x JOIN full_wk USING (wk)
),
agg AS (
  SELECT CAST(count(DISTINCT wk) AS BIGINT) AS b,
         CAST(sum((slot + 1) * r2) AS BIGINT) AS l2
  FROM ranked
)
SELECT b AS n_blocks, l2 AS l2_stat,
       CAST(112 * b AS BIGINT) AS e_l,
       CAST(floor((CAST(l2 AS DOUBLE) / 2.0 - CAST(112 * b AS DOUBLE))
                  / sqrt(392.0 * CAST(b AS DOUBLE) / 3.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM agg
WHERE b >= 1"""


def _register_dynamic() -> None:
    ORACLES272["events_ams_f2"] = _ams_oracle()


_register_dynamic()

QUERIES272 = {
    "events_ams_f2": q_events_ams_f2,
    "events_page_trend": q_events_page_trend,
}
