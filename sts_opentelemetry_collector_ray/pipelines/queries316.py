"""Driver-contract queries, wave 316 — depth-2 binary segmentation of
the daily series (up to four mean segments via exact integer CUSUM
argmax splits) and the survey-sampling ratio estimator of revenue per
unit quantity with its linearization variance. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES316: dict[str, str] = {}

_DAY_US = 86_400_000_000
_Z95 = 1.959963984540054


# ---------------------------------------------------------------------------
# events_binary_segmentation — depth-2 CUSUM mean segmentation
# ---------------------------------------------------------------------------


def _best_split(cum: np.ndarray, a: int, b: int) -> int | None:
    """Earliest argmax of |(b-a)(S_k - S_a) - (k-a)(S_b - S_a)| over
    k in [a+2, b-2] (min segment length 2); None if the window is too
    short. cum is the 1-based inclusive prefix-sum array (object ints),
    cum[0] = 0."""
    if b - a < 4:
        return None
    seg = int(cum[b] - cum[a])
    best_k, best_v = None, -1
    for k in range(a + 2, b - 1):
        v = abs((b - a) * int(cum[k] - cum[a]) - (k - a) * seg)
        if v > best_v:
            best_v, best_k = v, k
    return best_k


def q_events_binary_segmentation(sf_dir: str):
    """Depth-2 binary segmentation: split the zero-filled daily series
    at the integer-CUSUM argmax (earliest tie), then split each side the
    same way — up to four mean segments, each at least 2 days. All
    split decisions are EXACT integer comparisons; the segment mean is
    the one float step. Per segment: seg_start (epoch day), seg_len,
    sum_y, mean_milli."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["seg_start", "seg_len", "sum_y", "mean_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 4:
        return empty
    d0 = int(days.index.min())
    cum = np.concatenate([[0], np.cumsum(y.astype(object))])
    k1 = _best_split(cum, 0, n)
    bounds = [0, n] if k1 is None else [0, k1, n]
    if k1 is not None:
        k2 = _best_split(cum, 0, k1)
        k3 = _best_split(cum, k1, n)
        bounds = sorted(
            {0, n, k1}
            | ({k2} if k2 is not None else set())
            | ({k3} if k3 is not None else set())
        )
    rows = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        s = int(cum[b] - cum[a])
        rows.append(
            (
                np.int64(d0 + a), np.int64(b - a), np.int64(s),
                np.int64(np.floor(
                    float(s) / float(b - a) * 1_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES316["events_binary_segmentation"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) + 1 AS k
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.k, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
cum AS (
  SELECT k, CAST(sum(y) OVER (ORDER BY k) AS BIGINT) AS s FROM x
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(max(s) AS BIGINT) AS tot FROM cum),
k1 AS (
  SELECT cum.k
  FROM cum, nn
  WHERE cum.k >= 2 AND cum.k <= nn.n - 2 AND nn.n >= 4
  ORDER BY abs(CAST(nn.n AS HUGEINT) * cum.s
               - CAST(cum.k AS HUGEINT) * nn.tot) DESC, cum.k
  LIMIT 1
),
sa AS (SELECT coalesce((SELECT k FROM k1), -1) AS k1v),
k2 AS (
  SELECT cum.k
  FROM cum, sa, nn
  WHERE sa.k1v >= 4 AND cum.k >= 2 AND cum.k <= sa.k1v - 2
  ORDER BY abs(CAST(sa.k1v AS HUGEINT) * cum.s
               - CAST(cum.k AS HUGEINT)
                 * (SELECT s FROM cum WHERE k = sa.k1v)) DESC, cum.k
  LIMIT 1
),
k3 AS (
  SELECT cum.k
  FROM cum, sa, nn
  WHERE sa.k1v >= 0 AND nn.n - sa.k1v >= 4
    AND cum.k >= sa.k1v + 2 AND cum.k <= nn.n - 2
  ORDER BY abs(CAST(nn.n - sa.k1v AS HUGEINT)
               * (cum.s - (SELECT s FROM cum WHERE k = sa.k1v))
               - CAST(cum.k - sa.k1v AS HUGEINT)
                 * (nn.tot - (SELECT s FROM cum WHERE k = sa.k1v)))
           DESC, cum.k
  LIMIT 1
),
bounds AS (
  SELECT DISTINCT b FROM (
    SELECT 0 AS b
    UNION ALL SELECT n FROM nn
    UNION ALL SELECT k FROM k1
    UNION ALL SELECT k FROM k2
    UNION ALL SELECT k FROM k3
  ) WHERE b IS NOT NULL
),
segs AS (
  SELECT b AS a, lead(b) OVER (ORDER BY b) AS bb FROM bounds
),
out AS (
  SELECT g.d0 + s.a AS seg_start, s.bb - s.a AS seg_len,
         (SELECT coalesce(max(c2.s), 0) FROM cum c2 WHERE c2.k = s.bb)
           - (SELECT coalesce(max(c1.s), 0) FROM cum c1 WHERE c1.k = s.a)
           AS sum_y
  FROM segs s, g WHERE s.bb IS NOT NULL
)
SELECT CAST(seg_start AS BIGINT) AS seg_start,
       CAST(seg_len AS BIGINT) AS seg_len,
       CAST(sum_y AS BIGINT) AS sum_y,
       CAST(floor(CAST(sum_y AS DOUBLE) / seg_len * 1000.0 + 0.5)
            AS BIGINT) AS mean_milli
FROM out
ORDER BY seg_start"""


# ---------------------------------------------------------------------------
# lineitem_ratio_estimator — survey ratio of revenue to quantity
# ---------------------------------------------------------------------------


def q_lineitem_ratio_estimator(sf_dir: str):
    """Survey-sampling ratio estimator of revenue per unit quantity:
    R = sum y / sum x (y = extendedprice cents, x = quantity milli),
    with the linearization variance
    v(R) = sum (y - R x)^2 / ((n-1) n xbar^2) and the 95% normal CI.
    Moments are EXACT integers; the residual sum expands to
    Syy - 2R Sxy + R^2 Sxx in one mirrored float expression. One row:
    n, ratio_micro, se_micro, lo_micro, hi_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sx": [np.int64(int(x.sum()))],
                "sy": [np.int64(int(y.sum()))],
                "sxx": [int(np.sum(x.astype(object) * x.astype(object)))],
                "syy": [int(np.sum(y.astype(object) * y.astype(object)))],
                "sxy": [int(np.sum(x.astype(object) * y.astype(object)))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "ratio_micro", "se_micro", "lo_micro", "hi_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if p.empty:
        return empty
    n = int(p["n"].sum())
    sx = int(sum(int(v) for v in p["sx"]))
    sy = int(sum(int(v) for v in p["sy"]))
    sxx = int(sum(int(v) for v in p["sxx"]))
    syy = int(sum(int(v) for v in p["syy"]))
    sxy = int(sum(int(v) for v in p["sxy"]))
    if n < 2 or sx == 0:
        return empty
    r = float(sy) / float(sx)
    resid = float(syy) - 2.0 * r * float(sxy) + r * r * float(sxx)
    xbar = float(sx) / float(n)
    var = resid / (float(n - 1) * float(n) * xbar * xbar)
    if var < 0.0:
        return empty
    se = float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
                np.int64(np.floor(se * 1_000_000.0 + 0.5)),
                np.int64(np.floor((r - _Z95 * se) * 1_000_000.0 + 0.5)),
                np.int64(np.floor((r + _Z95 * se) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES316["lineitem_ratio_estimator"] = f"""
WITH base AS (
  SELECT CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM base
),
c AS (
  SELECT n, CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
         CAST(syy AS DOUBLE)
           - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
             * CAST(sxy AS DOUBLE)
           + (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
             * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
             * CAST(sxx AS DOUBLE) AS resid,
         CAST(sx AS DOUBLE) / n AS xbar
  FROM m WHERE n >= 2 AND sx <> 0
),
s AS (
  SELECT n, r, sqrt(resid / ((n - 1) * CAST(n AS DOUBLE) * xbar * xbar))
           AS se
  FROM c WHERE resid >= 0
)
SELECT n,
       CAST(floor(r * 1000000.0 + 0.5) AS BIGINT) AS ratio_micro,
       CAST(floor(se * 1000000.0 + 0.5) AS BIGINT) AS se_micro,
       CAST(floor((r - {_Z95} * se) * 1000000.0 + 0.5) AS BIGINT)
         AS lo_micro,
       CAST(floor((r + {_Z95} * se) * 1000000.0 + 0.5) AS BIGINT)
         AS hi_micro
FROM s"""


QUERIES316 = {
    "events_binary_segmentation": q_events_binary_segmentation,
    "lineitem_ratio_estimator": q_lineitem_ratio_estimator,
}
