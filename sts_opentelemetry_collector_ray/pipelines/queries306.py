"""Driver-contract queries, wave 306 — day-over-day Bray-Curtis
compositional turnover of the event-type mix (the ecology dissimilarity
classic) and the exact variance-reduction regression split: the
quantity threshold that best separates unit prices (the regression-tree
counterpart of `lineitem_stump_split`). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES306: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_bray_curtis_turnover — day-over-day mix dissimilarity
# ---------------------------------------------------------------------------


def q_events_bray_curtis_turnover(sf_dir: str):
    """Bray-Curtis turnover between consecutive calendar days' type
    count vectors: BC_t = sum_k |c_{t,k} - c_{t+1,k}| /
    sum_k (c_{t,k} + c_{t+1,k}) (both sums EXACT integers; pairs where
    the denominator is zero are skipped). Reported as the mean and max
    over day pairs plus the single worst day. One row: n_day_pairs,
    mean_bc_micro, max_bc_micro, worst_day.

    Scale shape: one bounded (day, type) combiner; the |days| x |types|
    table folds on the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "dy": pa.compute.cast(t["ts"], pa.int64()).to_numpy()
                // _DAY_US,
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["dy", "et"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["dy", "et"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_day_pairs", "mean_bc_micro", "max_bc_micro", "worst_day"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    d0, d1 = int(h["dy"].min()), int(h["dy"].max())
    n_days = d1 - d0 + 1
    if n_days < 2:
        return empty
    types = sorted(h["et"].unique())
    mat = np.zeros((n_days, len(types)), np.int64)
    tidx = {t: i for i, t in enumerate(types)}
    for dy, et, c in zip(h["dy"], h["et"], h["c"]):
        mat[int(dy) - d0, tidx[et]] = int(c)
    num = np.abs(mat[1:] - mat[:-1]).sum(axis=1)
    den = (mat[1:] + mat[:-1]).sum(axis=1)
    keep = den > 0
    if not keep.any():
        return empty
    bc = num[keep].astype(np.float64) / den[keep].astype(np.float64)
    days_k = (d0 + 1 + np.arange(n_days - 1))[keep]
    imax = int(np.argmax(bc))  # first max — deterministic
    # deterministic tie-break: earliest day among maximal BC values
    bmax = bc.max()
    worst = int(days_k[bc >= bmax].min())
    return pd.DataFrame(
        [
            (
                np.int64(int(keep.sum())),
                np.int64(np.floor(float(bc.mean()) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(bmax) * 1_000_000.0 + 0.5)),
                np.int64(worst),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES306["events_bray_curtis_turnover"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, event_type AS et,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
types AS (SELECT DISTINCT et FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy, t.et
  FROM g CROSS JOIN range(0, 20000) r CROSS JOIN types t
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy, grid.et, CAST(coalesce(h.c, 0) AS BIGINT) AS c
  FROM grid LEFT JOIN h ON h.dy = grid.dy AND h.et = grid.et
),
pair AS (
  SELECT a.dy + 1 AS dy2,
         CAST(sum(abs(b.c - a.c)) AS BIGINT) AS num,
         CAST(sum(b.c + a.c) AS BIGINT) AS den
  FROM x a JOIN x b ON b.dy = a.dy + 1 AND b.et = a.et
  GROUP BY 1
),
bc AS (
  SELECT dy2, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS v
  FROM pair WHERE den > 0
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(v) AS mean_v, max(v) AS max_v
  FROM bc
),
worst AS (
  SELECT min(bc.dy2) AS d FROM bc, agg WHERE bc.v >= agg.max_v
)
SELECT agg.n AS n_day_pairs,
       CAST(floor(agg.mean_v * 1000000.0 + 0.5) AS BIGINT)
         AS mean_bc_micro,
       CAST(floor(agg.max_v * 1000000.0 + 0.5) AS BIGINT) AS max_bc_micro,
       CAST(worst.d AS BIGINT) AS worst_day
FROM agg, worst
WHERE agg.n > 0"""


# ---------------------------------------------------------------------------
# lineitem_regression_split — exact variance-reduction stump
# ---------------------------------------------------------------------------


def q_lineitem_regression_split(sf_dir: str):
    """Regression stump: the quantity threshold t (left = quantity milli
    <= t) minimizing total within-side SSE of unit price (cents). Per
    candidate the SSE composition uses exact integer moments
    (SSE = Syy - Sy^2/n per side, evaluated in ONE mirrored float
    expression); ties break to the smallest threshold AFTER
    half-up rounding to integer cents^2 units (integer comparison — the
    `lineitem_stump_split` convention; SSE magnitudes make micro units
    overflow int64). One row: thresh_milli, n_left, n_right, sse_cents2,
    gain_cents2 (SSE reduction vs no split)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        q = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            / t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"q": q, "n": 1, "sy": y, "syy": y * y})
        out = df.groupby("q", as_index=False).sum()
        return out.astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("q")[["n", "sy", "syy"]]
        .sum()
        .sort_index()
    )
    cols = ["thresh_milli", "n_left", "n_right", "sse_cents2", "gain_cents2"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(m) < 2:
        return empty
    qv = m.index.to_numpy(np.int64)
    nn = m["n"].to_numpy(np.int64).astype(object)
    sy = m["sy"].to_numpy(np.int64).astype(object)
    syy = m["syy"].to_numpy(np.int64).astype(object)
    cn = np.cumsum(nn)
    cs = np.cumsum(sy)
    c2 = np.cumsum(syy)
    n_t, s_t, s2_t = int(cn[-1]), int(cs[-1]), int(c2[-1])
    sse_tot = float(s2_t) - float(s_t) * float(s_t) / float(n_t)
    best = None
    for i in range(len(qv) - 1):  # split after value i
        nl, sl, s2l = int(cn[i]), int(cs[i]), int(c2[i])
        nr, sr, s2r = n_t - nl, s_t - sl, s2_t - s2l
        if nl == 0 or nr == 0:
            continue
        sse = (
            (float(s2l) - float(sl) * float(sl) / float(nl))
            + (float(s2r) - float(sr) * float(sr) / float(nr))
        )
        key = int(np.floor(sse + 0.5))
        if best is None or key < best[0]:
            best = (key, int(qv[i]), nl, nr, sse)
    if best is None:
        return empty
    key, thresh, nl, nr, sse = best
    # mirror the oracle: rounded total minus the rounded key
    gain_key = int(np.floor(sse_tot + 0.5)) - key
    return pd.DataFrame(
        [
            (
                np.int64(thresh), np.int64(nl), np.int64(nr),
                np.int64(key), np.int64(gain_key),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES306["lineitem_regression_split"] = """
WITH base AS (
  SELECT CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT) AS q,
         CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)
           AS y
  FROM lineitem
),
m AS (
  SELECT q, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM base GROUP BY 1
),
cum AS (
  SELECT q,
         CAST(sum(n) OVER w AS BIGINT) AS cn,
         CAST(sum(sy) OVER w AS BIGINT) AS cs,
         CAST(sum(syy) OVER w AS HUGEINT) AS c2
  FROM m
  WINDOW w AS (ORDER BY q)
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS s,
         CAST(sum(syy) AS HUGEINT) AS s2,
         CAST(max(q) AS BIGINT) AS qmax
  FROM m
),
cand AS (
  SELECT cum.q AS thresh, cum.cn AS nl, tot.n - cum.cn AS nr,
         CAST(floor(((CAST(cum.c2 AS DOUBLE)
                      - CAST(cum.cs AS DOUBLE) * CAST(cum.cs AS DOUBLE)
                        / CAST(cum.cn AS DOUBLE))
                     + (CAST(tot.s2 - cum.c2 AS DOUBLE)
                        - CAST(tot.s - cum.cs AS DOUBLE)
                          * CAST(tot.s - cum.cs AS DOUBLE)
                          / CAST(tot.n - cum.cn AS DOUBLE)))
                    + 0.5) AS BIGINT) AS sse_key
  FROM cum, tot
  WHERE cum.q < tot.qmax AND cum.cn > 0 AND tot.n - cum.cn > 0
),
best AS (
  SELECT thresh, nl, nr, sse_key,
         row_number() OVER (ORDER BY sse_key, thresh) AS rk
  FROM cand
)
SELECT b.thresh AS thresh_milli, b.nl AS n_left, b.nr AS n_right,
       b.sse_key AS sse_cents2,
       CAST(floor((CAST(tot.s2 AS DOUBLE)
                   - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                     / CAST(tot.n AS DOUBLE))
                  + 0.5) AS BIGINT)
         - b.sse_key AS gain_cents2
FROM best b, tot
WHERE b.rk = 1"""


QUERIES306 = {
    "events_bray_curtis_turnover": q_events_bray_curtis_turnover,
    "lineitem_regression_split": q_lineitem_regression_split,
}
