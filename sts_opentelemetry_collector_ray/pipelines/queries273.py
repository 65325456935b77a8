"""Driver-contract queries, wave 273 — the Stuart-Maxwell marginal
homogeneity test on the top-3 event-type transition matrix (closed-form
2x2 inverse, exact integer quadratic form) and the Cox-Stuart paired-half
trend test on the daily series. Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES273: dict[str, str] = {}

_DAY_US = 86_400_000_000
_SM_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_stuart_maxwell — marginal homogeneity of top-3 transitions
# ---------------------------------------------------------------------------


def q_events_stuart_maxwell(sf_dir: str):
    """Stuart-Maxwell test: restrict events to the top-3 types (count
    desc, name asc), form per-user consecutive transitions ordered by
    (ts, event_id), and test whether the 'from' and 'to' marginals of
    the 3x3 matrix agree. With d_i = row_i - col_i for the first two
    types and S11 = r1 + c1 - 2 n11, S22 = r2 + c2 - 2 n22,
    S12 = -(n12 + n21), chi2 = (d1^2 S22 - 2 d1 d2 S12 + d2^2 S11)
    / (S11 S22 - S12^2) — EXACT integers, one division (dof = 2). One
    row: type_a, type_b, type_c, d1, d2, chi2_micro.

    Scale shape: ONE user-bucket exchange; per-bucket vectorized
    shifted-pair counting (the `events_bowker_symmetry` idiom); the
    driver folds the 3x3 matrix."""

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
        df["_b"] = (df["u"] % _SM_BUCKETS).astype(np.int64)
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
    cols = ["type_a", "type_b", "type_c", "d1", "d2", "chi2_micro"]
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
    n = {
        (x, z): int(mat.get((x, z), 0)) for x in top3 for z in top3
    }
    row = {x: sum(n[(x, z)] for z in top3) for x in top3}
    col = {z: sum(n[(x, z)] for x in top3) for z in top3}
    d1 = row[ta] - col[ta]
    d2 = row[tb] - col[tb]
    s11 = row[ta] + col[ta] - 2 * n[(ta, ta)]
    s22 = row[tb] + col[tb] - 2 * n[(tb, tb)]
    s12 = -(n[(ta, tb)] + n[(tb, ta)])
    det = s11 * s22 - s12 * s12
    if det <= 0:
        return empty
    chi2 = float(d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11) / float(det)
    return pd.DataFrame(
        [
            (
                ta, tb, tc, np.int64(d1), np.int64(d2),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[3:]})


ORACLES273["events_stuart_maxwell"] = """
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
cell AS (
  SELECT a.event_type AS fa, b.event_type AS tb_,
         CAST(coalesce((SELECT c FROM m
                        WHERE m.f = a.event_type
                          AND m.t = b.event_type), 0) AS BIGINT) AS c
  FROM top3 a CROSS JOIN top3 b
),
marg AS (
  SELECT t3.event_type AS ty, t3.rk,
         (SELECT sum(c) FROM cell WHERE fa = t3.event_type) AS r,
         (SELECT sum(c) FROM cell WHERE tb_ = t3.event_type) AS cc,
         (SELECT c FROM cell WHERE fa = t3.event_type
            AND tb_ = t3.event_type) AS diag
  FROM top3 t3
),
s AS (
  SELECT
    (SELECT r - cc FROM marg WHERE rk = 1) AS d1,
    (SELECT r - cc FROM marg WHERE rk = 2) AS d2,
    (SELECT r + cc - 2 * diag FROM marg WHERE rk = 1) AS s11,
    (SELECT r + cc - 2 * diag FROM marg WHERE rk = 2) AS s22,
    -((SELECT c FROM cell WHERE fa = (SELECT event_type FROM top3
                                      WHERE rk = 1)
         AND tb_ = (SELECT event_type FROM top3 WHERE rk = 2))
      + (SELECT c FROM cell WHERE fa = (SELECT event_type FROM top3
                                        WHERE rk = 2)
           AND tb_ = (SELECT event_type FROM top3 WHERE rk = 1))) AS s12
)
SELECT (SELECT event_type FROM top3 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top3 WHERE rk = 2) AS type_b,
       (SELECT event_type FROM top3 WHERE rk = 3) AS type_c,
       CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       CAST(floor(CAST(d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11
                       AS DOUBLE)
                  / CAST(s11 * s22 - s12 * s12 AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM s
WHERE s11 * s22 - s12 * s12 > 0
  AND (SELECT count(*) FROM top3) >= 3"""


# ---------------------------------------------------------------------------
# events_cox_stuart — paired-half trend sign test
# ---------------------------------------------------------------------------


def q_events_cox_stuart(sf_dir: str):
    """Cox-Stuart trend test: pair day i with day i + c (c = n // 2,
    middle day dropped when n is odd), count strict increases and
    decreases across the half-span (ties dropped), and z with continuity
    correction = (|plus - m/2| - 0.5) / sqrt(m/4). One row: n_days,
    n_pairs, n_plus, n_minus, z_micro — counting is pure integers."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "n_pairs", "n_plus", "n_minus", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    c = n // 2
    if c < 1:
        return empty
    a = y[:c]
    b = y[n - c:]
    plus = int((b > a).sum())
    minus = int((b < a).sum())
    m = plus + minus
    if m == 0:
        return empty
    z = (abs(float(plus) - float(m) / 2.0) - 0.5) / float(
        np.sqrt(float(m) / 4.0)
    )
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(m), np.int64(plus), np.int64(minus),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES273["events_cox_stuart"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
p AS (
  SELECT a.y AS ya, b.y AS yb
  FROM x a JOIN nn ON a.t < nn.n // 2
  JOIN x b ON b.t = a.t + (nn.n - nn.n // 2)
),
agg AS (
  SELECT CAST(sum(CASE WHEN yb > ya THEN 1 ELSE 0 END) AS BIGINT) AS plus,
         CAST(sum(CASE WHEN yb < ya THEN 1 ELSE 0 END) AS BIGINT) AS minus
  FROM p
)
SELECT nn.n AS n_days, agg.plus + agg.minus AS n_pairs,
       agg.plus AS n_plus, agg.minus AS n_minus,
       CAST(floor((abs(CAST(agg.plus AS DOUBLE)
                       - CAST(agg.plus + agg.minus AS DOUBLE) / 2.0) - 0.5)
                  / sqrt(CAST(agg.plus + agg.minus AS DOUBLE) / 4.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM nn, agg
WHERE agg.plus + agg.minus > 0 AND nn.n // 2 >= 1"""


QUERIES273 = {
    "events_stuart_maxwell": q_events_stuart_maxwell,
    "events_cox_stuart": q_events_cox_stuart,
}
