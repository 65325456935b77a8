"""Driver-contract queries, wave 390 — transfer entropy between the
top-2 event types' binarized daily series and the Cochran-Armitage
test for a return-rate trend across discount levels. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES390: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_transfer_entropy_top2 — directional information flow
# ---------------------------------------------------------------------------


def q_events_transfer_entropy_top2(sf_dir: str):
    """Transfer entropy: the two most frequent event types (ties
    alphabetical) binarize per day (count > type lower median of the
    zero-filled series); TE(X->Y) = H(Y'|Y) - H(Y'|Y,X) from exact
    8-cell triple counts, ln folds in cell order. One row: type_x,
    type_y, n_days, te_xy_micro, te_yx_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        g = (
            pd.DataFrame({"et": et, "d": day})
            .groupby(["et", "d"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    daily = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "d"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["type_x", "type_y", "n_days", "te_xy_micro", "te_yx_micro"]
    empty = pd.DataFrame(
        {
            "type_x": pd.Series([], dtype=object),
            "type_y": pd.Series([], dtype=object),
            "n_days": pd.Series([], dtype=np.int64),
            "te_xy_micro": pd.Series([], dtype=np.int64),
            "te_yx_micro": pd.Series([], dtype=np.int64),
        }
    )
    if daily.empty:
        return empty
    totals = daily.groupby("et")["c"].sum()
    order = sorted(totals.items(), key=lambda kv: (-int(kv[1]), kv[0]))
    if len(order) < 2:
        return empty
    tx, ty = order[0][0], order[1][0]
    d0 = int(daily["d"].min())
    d1 = int(daily["d"].max())
    n = d1 - d0 + 1
    if n < 20:
        return empty

    def series(et: str) -> np.ndarray:
        y = np.zeros(n, np.int64)
        sub = daily[daily["et"] == et]
        y[sub["d"].to_numpy(np.int64) - d0] = sub["c"].to_numpy(np.int64)
        s = np.sort(y)
        med = int(s[(n - 1) // 2])
        return (y > med).astype(np.int64)

    bx = series(tx)
    by = series(ty)

    def te(src: np.ndarray, dst: np.ndarray) -> float:
        # triple (dst_next, dst_cur, src_cur) counts
        key = 4 * dst[1:] + 2 * dst[:-1] + src[:-1]
        cnt = np.zeros(8, np.int64)
        for k_ in key:
            cnt[int(k_)] += 1
        m = int(cnt.sum())
        # H(Y'|Y) from pair counts; H(Y'|Y,X) from triple counts
        pair = np.zeros(4, np.int64)  # (y', y)
        ctx2 = np.zeros(2, np.int64)  # (y)
        ctx3 = np.zeros(4, np.int64)  # (y, x)
        for k_ in range(8):
            yp, yc, xc = k_ >> 2, (k_ >> 1) & 1, k_ & 1
            pair[2 * yp + yc] += int(cnt[k_])
            ctx2[yc] += int(cnt[k_])
            ctx3[2 * yc + xc] += int(cnt[k_])

        def ent_sum(arr) -> float:
            acc = 0.0
            for v in arr:
                if int(v) > 0:
                    acc = acc + float(int(v)) * float(
                        np.log(float(int(v)))
                    )
            return acc

        # single division to match the oracle expression shape exactly
        return (
            (ent_sum(ctx2) - ent_sum(pair))
            - (ent_sum(ctx3) - ent_sum(cnt))
        ) / float(m)

    return pd.DataFrame(
        [
            (
                tx, ty, np.int64(n),
                np.int64(np.floor(te(bx, by) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(te(by, bx) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({"n_days": np.int64, "te_xy_micro": np.int64,
              "te_yx_micro": np.int64})


def _te_sql(src: str, dst: str) -> str:
    """TE({src}->{dst}) expression over the bin CTE with columns
    t, bx, by."""
    return f"""
(
  WITH tri AS (
    SELECT 4 * b2.{dst} + 2 * b1.{dst} + b1.{src} AS k,
           CAST(count(*) AS BIGINT) AS c
    FROM bin b1 JOIN bin b2 ON b2.t = b1.t + 1
    GROUP BY 1
  ),
  m AS (SELECT CAST(sum(c) AS BIGINT) AS m FROM tri),
  pair AS (
    SELECT 2 * (k // 4) + ((k // 2) % 2) AS p,
           CAST(sum(c) AS BIGINT) AS c
    FROM tri GROUP BY 1
  ),
  c2 AS (
    SELECT (k // 2) % 2 AS p, CAST(sum(c) AS BIGINT) AS c
    FROM tri GROUP BY 1
  ),
  c3 AS (
    SELECT 2 * ((k // 2) % 2) + (k % 2) AS p,
           CAST(sum(c) AS BIGINT) AS c
    FROM tri GROUP BY 1
  )
  SELECT (((SELECT coalesce(sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))), 0.0)
            FROM c2 WHERE c > 0)
           - (SELECT coalesce(sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))), 0.0)
              FROM pair WHERE c > 0))
          - ((SELECT coalesce(sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))), 0.0)
              FROM c3 WHERE c > 0)
             - (SELECT coalesce(sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))), 0.0)
                FROM tri WHERE c > 0)))
         / (SELECT m FROM m)
)"""


ORACLES390["events_transfer_entropy_top2"] = f"""
WITH daily AS (
  SELECT event_type AS et, epoch_us(ts) // {_DAY_US} AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT et, CAST(sum(c) AS BIGINT) AS s,
         row_number() OVER (ORDER BY sum(c) DESC, et) AS rk
  FROM daily GROUP BY 1
),
top2 AS (
  SELECT (SELECT et FROM tot WHERE rk = 1) AS tx,
         (SELECT et FROM tot WHERE rk = 2) AS ty
),
g AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
grid AS (
  SELECT CAST(r.range AS BIGINT) AS t, g.d0 + CAST(r.range AS BIGINT)
           AS ad
  FROM g CROSS JOIN range(0, 100000) r
  WHERE r.range <= g.d1 - g.d0
),
sx AS (
  SELECT grid.t, CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM grid
  LEFT JOIN daily ON daily.d = grid.ad
    AND daily.et = (SELECT tx FROM top2)
),
sy AS (
  SELECT grid.t, CAST(coalesce(daily.c, 0) AS BIGINT) AS y
  FROM grid
  LEFT JOIN daily ON daily.d = grid.ad
    AND daily.et = (SELECT ty FROM top2)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
mx AS (
  SELECT min(y) AS m
  FROM (SELECT y, row_number() OVER (ORDER BY y) AS rn FROM sx), nn
  WHERE rn >= (nn.n + 1) // 2
),
my AS (
  SELECT min(y) AS m
  FROM (SELECT y, row_number() OVER (ORDER BY y) AS rn FROM sy), nn
  WHERE rn >= (nn.n + 1) // 2
),
bin AS (
  SELECT sx.t,
         CASE WHEN sx.y > mx.m THEN 1 ELSE 0 END AS bx,
         CASE WHEN sy.y > my.m THEN 1 ELSE 0 END AS by
  FROM sx JOIN sy USING (t), mx, my
)
SELECT top2.tx AS type_x, top2.ty AS type_y,
       nn.n AS n_days,
       CAST(floor({_te_sql('bx', 'by')} * 1000000.0 + 0.5) AS BIGINT)
         AS te_xy_micro,
       CAST(floor({_te_sql('by', 'bx')} * 1000000.0 + 0.5) AS BIGINT)
         AS te_yx_micro
FROM top2, nn
WHERE nn.n >= 20"""


# ---------------------------------------------------------------------------
# lineitem_return_trend_ca — Cochran-Armitage across discount levels
# ---------------------------------------------------------------------------


def q_lineitem_return_trend_ca(sf_dir: str):
    """Cochran-Armitage: does the 'R' return share trend with discount
    depth? Levels = distinct discount milli values with scores equal
    to the milli value. T = sum w_i (r_i - n_i R/N) with exact integer
    core N*T' = N*sum(w r) - R*sum(w n); variance
    p(1-p) [sum w^2 n - (sum w n)^2/N]. One row: n, n_levels, n_ret,
    t_milli, z_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        disc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ret = (
            t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        g = (
            pd.DataFrame({"w": disc, "n": 1, "r": ret})
            .groupby("w", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    lv = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("w")[["n", "r"]]
        .sum()
        .sort_index()
    )
    cols = ["n", "n_levels", "n_ret", "t_milli", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if lv.empty or len(lv) < 2:
        return empty
    w = lv.index.to_numpy(np.int64).astype(object)
    nv = lv["n"].to_numpy(np.int64).astype(object)
    rv = lv["r"].to_numpy(np.int64).astype(object)
    n = int(nv.sum())
    r = int(rv.sum())
    if r == 0 or r == n:
        return empty
    swr = int((w * rv).sum())
    swn = int((w * nv).sum())
    sw2n = int((w * w * nv).sum())
    # T = sum w r - (R/N) sum w n  (exact integer core N*T)
    nt = n * swr - r * swn
    t_stat = float(nt) / float(n)
    p = float(r) / float(n)
    var = p * (1.0 - p) * (
        float(sw2n) - float(swn) * float(swn) / float(n)
    )
    if var <= 0.0:
        return empty
    z = t_stat / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(len(lv)), np.int64(r),
                np.int64(np.floor(t_stat * 1_000.0 + 0.5)),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES390["lineitem_return_trend_ca"] = """
WITH b AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS w,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
lv AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n, CAST(sum(ret) AS BIGINT) AS r
  FROM b GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS r,
         CAST(sum(CAST(w AS HUGEINT) * r) AS HUGEINT) AS swr,
         CAST(sum(CAST(w AS HUGEINT) * n) AS HUGEINT) AS swn,
         CAST(sum(CAST(w AS HUGEINT) * w * n) AS HUGEINT) AS sw2n
  FROM lv
),
f AS (
  SELECT k, n, r,
         CAST(CAST(n AS HUGEINT) * swr
              - CAST(r AS HUGEINT) * swn AS DOUBLE) / n AS t,
         (CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
           * (CAST(sw2n AS DOUBLE)
              - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE) / n) AS var
  FROM agg
  WHERE k >= 2 AND r > 0 AND r < n
)
SELECT n, k AS n_levels, r AS n_ret,
       CAST(floor(t * 1000.0 + 0.5) AS BIGINT) AS t_milli,
       CAST(floor(t / sqrt(var) * 1000000.0 + 0.5) AS BIGINT)
         AS z_micro
FROM f
WHERE var > 0"""


QUERIES390 = {
    "events_transfer_entropy_top2": q_events_transfer_entropy_top2,
    "lineitem_return_trend_ca": q_lineitem_return_trend_ca,
}
