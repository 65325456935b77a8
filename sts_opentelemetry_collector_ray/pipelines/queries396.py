"""Driver-contract queries, wave 396 — a log-linear Poisson GLM trend
fit on daily event counts (5 unrolled Newton iterations, mirrored
folds) and the first-event-of-day type census with lift against the
overall mix. Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES396: dict[str, str] = {}

_DAY_US = 86_400_000_000
_GLM_ITERS = 5


# ---------------------------------------------------------------------------
# events_poisson_glm_trend — log-linear daily trend
# ---------------------------------------------------------------------------


def q_events_poisson_glm_trend(sf_dir: str):
    """Poisson GLM ln E[y] = b0 + b1 * x over the zero-filled daily
    series (x = centered day index scaled by 1/n): 5 Newton-Raphson
    iterations from b = (ln(mean), 0); per iteration the score and
    Hessian fold over days in time order. One row: n_days, b0_micro,
    b1_micro, dev_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(day).groupby(day).size()
        return pd.DataFrame(
            {"d": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    daily = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("d")["c"]
        .sum()
    )
    cols = ["n_days", "b0_micro", "b1_micro", "dev_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    d0, d1 = int(daily.index.min()), int(daily.index.max())
    n = d1 - d0 + 1
    if n < 10:
        return empty
    y = np.zeros(n, np.int64)
    y[daily.index.to_numpy(np.int64) - d0] = daily.to_numpy(np.int64)
    s = int(y.astype(object).sum())
    if s == 0:
        return empty
    b0 = float(np.log(float(s) / float(n)))
    b1 = 0.0
    xs = [
        (float(t_) - (float(n) - 1.0) / 2.0) / float(n) for t_ in range(n)
    ]
    for _ in range(_GLM_ITERS):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for t_ in range(n):
            mu = float(np.exp(b0 + b1 * xs[t_]))
            r_ = float(int(y[t_])) - mu
            g0 = g0 + r_
            g1 = g1 + r_ * xs[t_]
            h00 = h00 + mu
            h01 = h01 + mu * xs[t_]
            h11 = h11 + mu * xs[t_] * xs[t_]
        det = h00 * h11 - h01 * h01
        if det <= 0.0:
            return empty
        b0 = b0 + (h11 * g0 - h01 * g1) / det
        b1 = b1 + (h00 * g1 - h01 * g0) / det
    dev = 0.0
    for t_ in range(n):
        mu = float(np.exp(b0 + b1 * xs[t_]))
        yi = float(int(y[t_]))
        if yi > 0.0:
            dev = dev + yi * float(np.log(yi / mu)) - (yi - mu)
        else:
            dev = dev + mu
    dev = 2.0 * dev
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(b0 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(b1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(dev * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _glm_iter_sql(i: int) -> str:
    return f"""
terms{i} AS MATERIALIZED (
  SELECT x.t, x.y, x.xv, exp(b{i}.b0 + b{i}.b1 * x.xv) AS mu
  FROM x, b{i}
),
sums{i} AS MATERIALIZED (
  SELECT
    list_reduce(list_prepend(0.0,
      list(CAST(y AS DOUBLE) - mu ORDER BY t)), (a, b) -> a + b) AS g0,
    list_reduce(list_prepend(0.0,
      list((CAST(y AS DOUBLE) - mu) * xv ORDER BY t)),
      (a, b) -> a + b) AS g1,
    list_reduce(list_prepend(0.0, list(mu ORDER BY t)),
                (a, b) -> a + b) AS h00,
    list_reduce(list_prepend(0.0, list(mu * xv ORDER BY t)),
                (a, b) -> a + b) AS h01,
    list_reduce(list_prepend(0.0, list(mu * xv * xv ORDER BY t)),
                (a, b) -> a + b) AS h11
  FROM terms{i}
),
b{i + 1} AS MATERIALIZED (
  SELECT b{i}.b0 + (s.h11 * s.g0 - s.h01 * s.g1)
                     / (s.h00 * s.h11 - s.h01 * s.h01) AS b0,
         b{i}.b1 + (s.h00 * s.g1 - s.h01 * s.g0)
                     / (s.h00 * s.h11 - s.h01 * s.h01) AS b1
  FROM b{i}, sums{i} s
  WHERE s.h00 * s.h11 - s.h01 * s.h01 > 0
)"""


ORACLES396["events_poisson_glm_trend"] = (
    f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(d) AS d0, max(d) AS d1 FROM h),
nnx AS (SELECT CAST(g.d1 - g.d0 + 1 AS BIGINT) AS n FROM g),
x AS MATERIALIZED (
  SELECT CAST(r.range AS BIGINT) AS t,
         CAST(coalesce(h.c, 0) AS BIGINT) AS y,
         (CAST(r.range AS DOUBLE) - (CAST(nnx.n AS DOUBLE) - 1.0) / 2.0)
           / nnx.n AS xv
  FROM g CROSS JOIN range(0, 100000) r
  LEFT JOIN h ON h.d = g.d0 + CAST(r.range AS BIGINT), nnx
  WHERE r.range <= g.d1 - g.d0
),
tot AS (SELECT CAST(sum(y) AS BIGINT) AS s FROM x),
b0 AS MATERIALIZED (
  SELECT ln(CAST(tot.s AS DOUBLE) / nnx.n) AS b0, 0.0 AS b1
  FROM tot, nnx WHERE tot.s > 0 AND nnx.n >= 10
),
"""
    + ",\n".join(_glm_iter_sql(i) for i in range(_GLM_ITERS))
    + f""",
dev AS (
  SELECT 2.0 * list_reduce(list_prepend(0.0,
           list(CASE WHEN y > 0
                     THEN CAST(y AS DOUBLE)
                          * ln(CAST(y AS DOUBLE)
                               / exp(b.b0 + b.b1 * xv))
                          - (CAST(y AS DOUBLE)
                             - exp(b.b0 + b.b1 * xv))
                     ELSE exp(b.b0 + b.b1 * xv) END ORDER BY t)),
           (p, q) -> p + q) AS d
  FROM x, b{_GLM_ITERS} b
  GROUP BY b.b0, b.b1
)
SELECT nnx.n AS n_days,
       CAST(floor(b.b0 * 1000000.0 + 0.5) AS BIGINT) AS b0_micro,
       CAST(floor(b.b1 * 1000000.0 + 0.5) AS BIGINT) AS b1_micro,
       CAST(floor(dev.d * 1000.0 + 0.5) AS BIGINT) AS dev_milli
FROM nnx, b{_GLM_ITERS} b, dev"""
)


# ---------------------------------------------------------------------------
# events_first_of_day_census — which type opens the day
# ---------------------------------------------------------------------------


def q_events_first_of_day_census(sf_dir: str):
    """Day openers: per day the first event (min ts, event_id ties);
    census by type with lift against the overall type mix. Per type:
    event_type, n_days_first, first_share_micro, overall_share_micro,
    lift_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        df["d"] = df["ts"] // _DAY_US
        firsts = df.sort_values(["d", "ts", "eid"]).groupby(
            "d", as_index=False
        ).first()
        counts = df.groupby("et").size().rename("c").reset_index()
        firsts = firsts[["d", "ts", "eid", "et"]]
        firsts["kind"] = np.int64(0)
        counts["kind"] = np.int64(1)
        counts["d"] = np.int64(-1)
        counts["ts"] = np.int64(-1)
        counts["eid"] = counts["c"].astype(np.int64)
        return pd.concat(
            [firsts[["kind", "d", "ts", "eid", "et"]],
             counts[["kind", "d", "ts", "eid", "et"]]],
            ignore_index=True,
        )

    folded = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "ts", "event_id"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_days_first", "first_share_micro",
            "overall_share_micro", "lift_milli"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if folded.empty:
        return empty
    cand = folded[folded["kind"] == 0]
    firsts = cand.sort_values(["d", "ts", "eid"]).groupby(
        "d", as_index=False
    ).first()
    totals = folded[folded["kind"] == 1].groupby("et")["eid"].sum()
    n_days = len(firsts)
    n_tot = int(totals.sum())
    if n_days == 0 or n_tot == 0:
        return empty
    fc = firsts.groupby("et").size()
    rows = []
    for et in sorted(totals.index):
        nf = int(fc.get(et, 0))
        fs = float(nf) / float(n_days)
        ov = float(int(totals[et])) / float(n_tot)
        rows.append(
            (
                et, np.int64(nf),
                np.int64(np.floor(fs * 1_000_000.0 + 0.5)),
                np.int64(np.floor(ov * 1_000_000.0 + 0.5)),
                np.int64(np.floor(fs / ov * 1_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES396["events_first_of_day_census"] = f"""
WITH base AS (
  SELECT event_type AS et, epoch_us(ts) AS us, event_id,
         epoch_us(ts) // {_DAY_US} AS d
  FROM events
),
firsts AS (
  SELECT d, et,
         row_number() OVER (PARTITION BY d ORDER BY us, event_id) AS rk
  FROM base
),
fc AS (
  SELECT et, CAST(count(*) AS BIGINT) AS nf
  FROM firsts WHERE rk = 1 GROUP BY 1
),
nd AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n FROM base),
tot AS (SELECT et, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tot)
SELECT tot.et AS event_type,
       CAST(coalesce(fc.nf, 0) AS BIGINT) AS n_days_first,
       CAST(floor(CAST(coalesce(fc.nf, 0) AS DOUBLE) / nd.n
                  * 1000000.0 + 0.5) AS BIGINT) AS first_share_micro,
       CAST(floor(CAST(tot.c AS DOUBLE) / nt.n * 1000000.0 + 0.5)
            AS BIGINT) AS overall_share_micro,
       CAST(floor((CAST(coalesce(fc.nf, 0) AS DOUBLE) / nd.n)
                  / (CAST(tot.c AS DOUBLE) / nt.n) * 1000.0 + 0.5)
            AS BIGINT) AS lift_milli
FROM tot LEFT JOIN fc USING (et), nd, nt
WHERE nd.n > 0 AND nt.n > 0
ORDER BY event_type"""


QUERIES396 = {
    "events_poisson_glm_trend": q_events_poisson_glm_trend,
    "events_first_of_day_census": q_events_first_of_day_census,
}
