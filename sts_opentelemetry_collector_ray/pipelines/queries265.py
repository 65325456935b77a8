"""Driver-contract queries, wave 265 — sample entropy (SampEn, m=2,
integer MAD-derived Chebyshev tolerance) and the turning-points
randomness test, both over the zero-filled daily event-count series.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sts_opentelemetry_collector_ray.pipelines.queries264 import (
    _daily_counts,
    _grid,
)

ORACLES265: dict[str, str] = {}

_DAY_US = 86_400_000_000

_DAILY_SQL = f"""
h AS (
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
)"""


def _lower_median(v: np.ndarray) -> int:
    """Lower median: element at sorted index (n-1)//2 — pure integer,
    no .5 interpolation, replayed in SQL as the smallest value whose
    cumulative count reaches (n+1)//2."""
    return int(np.sort(v)[(len(v) - 1) // 2])


# ---------------------------------------------------------------------------
# events_sample_entropy — SampEn(m=2, r = max(1, MAD)) of daily counts
# ---------------------------------------------------------------------------


def q_events_sample_entropy(sf_dir: str):
    """Sample entropy of the daily count series: template length m=2,
    Chebyshev tolerance r = max(1, MAD) where MAD is the LOWER-median
    absolute deviation from the lower median — an integer, so every
    template match is an exact integer comparison. B counts pairs i<j
    with max(|y_i-y_j|, |y_{i+1}-y_{j+1}|) <= r over the n-2 templates
    of length 2 (self-matches excluded by i<j), A adds the third
    coordinate; SampEn = -ln(A/B) is the single float step. One row:
    n_days, r_tol, n_b, n_a, sampen_micro.

    Scale shape: the distributed work is the bounded per-batch
    (day -> count) combiner; the O(|days|^2) match count runs on the
    bounded driver grid (|days| is calendar-bounded at any corpus
    size)."""
    days = _daily_counts(sf_dir)
    cols = ["n_days", "r_tol", "n_b", "n_a", "sampen_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 4:
        return empty
    med = _lower_median(y)
    mad = _lower_median(np.abs(y - med))
    r = max(1, mad)
    # pairwise Chebyshev matches among length-2 / length-3 templates
    d = np.abs(y[:, None] - y[None, :]) <= r  # d[i,j] = |y_i - y_j| <= r
    m2 = d[:-2, :-2] & d[1:-1, 1:-1]  # templates starting at i, j (len n-2)
    m3 = m2 & d[2:, 2:]
    iu = np.triu_indices(n - 2, k=1)
    n_b = int(m2[iu].sum())
    n_a = int(m3[iu].sum())
    if n_b == 0 or n_a == 0:
        return empty
    sampen = float(-np.log(float(n_a) / float(n_b)))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(r), np.int64(n_b), np.int64(n_a),
                np.int64(np.floor(sampen * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES265["events_sample_entropy"] = f"""
WITH {_DAILY_SQL},
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
med AS (
  SELECT min(y) AS med FROM (
    SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM vc
  ), nn WHERE cum >= (nn.n + 1) // 2
),
dev AS (
  SELECT abs(x.y - med.med) AS a FROM x, med
),
dc AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM dev GROUP BY 1),
mad AS (
  SELECT min(a) AS mad FROM (
    SELECT a, sum(c) OVER (ORDER BY a) AS cum FROM dc
  ), nn WHERE cum >= (nn.n + 1) // 2
),
tol AS (SELECT greatest(CAST(1 AS BIGINT), mad) AS r FROM mad),
tpl AS (
  SELECT t, y,
         lead(y, 1) OVER (ORDER BY t) AS y1,
         lead(y, 2) OVER (ORDER BY t) AS y2
  FROM x
),
tm AS (SELECT t, y, y1, y2 FROM tpl WHERE y2 IS NOT NULL),
pairs AS (
  SELECT CAST(abs(a.y - b.y) <= tol.r
              AND abs(a.y1 - b.y1) <= tol.r AS INT) AS mb,
         CAST(abs(a.y - b.y) <= tol.r AND abs(a.y1 - b.y1) <= tol.r
              AND abs(a.y2 - b.y2) <= tol.r AS INT) AS ma
  FROM tm a JOIN tm b ON a.t < b.t, tol
),
agg AS (
  SELECT CAST(sum(mb) AS BIGINT) AS n_b, CAST(sum(ma) AS BIGINT) AS n_a
  FROM pairs
)
SELECT nn.n AS n_days, tol.r AS r_tol, agg.n_b, agg.n_a,
       CAST(floor(-ln(CAST(agg.n_a AS DOUBLE) / CAST(agg.n_b AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS sampen_micro
FROM nn, tol, agg
WHERE nn.n >= 4 AND agg.n_b > 0 AND agg.n_a > 0"""


# ---------------------------------------------------------------------------
# events_turning_points — peaks/troughs count vs randomness expectation
# ---------------------------------------------------------------------------


def q_events_turning_points(sf_dir: str):
    """Turning-points randomness test: count STRICT local peaks
    (y_{t-1} < y_t > y_{t+1}) and troughs (both reversed) in the daily
    series. Under i.i.d. randomness E[T] = 2(n-2)/3 and
    Var[T] = (16n - 29)/90 — exact rationals, reported in micro; the
    z-score is the single float step. One row: n_days, n_peaks,
    n_troughs, n_turning, e_micro, var_micro, z_micro."""
    days = _daily_counts(sf_dir)
    cols = [
        "n_days", "n_peaks", "n_troughs", "n_turning",
        "e_micro", "var_micro", "z_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 3:
        return empty
    a, b, c = y[:-2], y[1:-1], y[2:]
    peaks = int(((a < b) & (b > c)).sum())
    troughs = int(((a > b) & (b < c)).sum())
    t = peaks + troughs
    e = 2.0 * float(n - 2) / 3.0
    var = (16.0 * float(n) - 29.0) / 90.0
    z = (float(t) - e) / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(peaks), np.int64(troughs), np.int64(t),
                np.int64(np.floor(e * 1_000_000.0 + 0.5)),
                np.int64(np.floor(var * 1_000_000.0 + 0.5)),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES265["events_turning_points"] = f"""
WITH {_DAILY_SQL},
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
tri AS (
  SELECT lag(y) OVER (ORDER BY t) AS a, y AS b,
         lead(y) OVER (ORDER BY t) AS c
  FROM x
),
tp AS (
  SELECT CAST(a < b AND b > c AS INT) AS pk,
         CAST(a > b AND b < c AS INT) AS tr
  FROM tri WHERE a IS NOT NULL AND c IS NOT NULL
),
agg AS (
  SELECT CAST(sum(pk) AS BIGINT) AS n_peaks,
         CAST(sum(tr) AS BIGINT) AS n_troughs
  FROM tp
)
SELECT nn.n AS n_days, agg.n_peaks, agg.n_troughs,
       agg.n_peaks + agg.n_troughs AS n_turning,
       CAST(floor(2.0 * CAST(nn.n - 2 AS DOUBLE) / 3.0 * 1000000.0 + 0.5)
            AS BIGINT) AS e_micro,
       CAST(floor((16.0 * CAST(nn.n AS DOUBLE) - 29.0) / 90.0
                  * 1000000.0 + 0.5) AS BIGINT) AS var_micro,
       CAST(floor((CAST(agg.n_peaks + agg.n_troughs AS DOUBLE)
                   - 2.0 * CAST(nn.n - 2 AS DOUBLE) / 3.0)
                  / sqrt((16.0 * CAST(nn.n AS DOUBLE) - 29.0) / 90.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM nn, agg
WHERE nn.n >= 3"""


QUERIES265 = {
    "events_sample_entropy": q_events_sample_entropy,
    "events_turning_points": q_events_turning_points,
}
