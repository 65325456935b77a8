"""Driver-contract queries, wave 232 — rescaled-range (R/S) Hurst exponent
over block sizes {8,16,32} and recurrence quantification (recurrence rate +
determinism) of the hourly count series.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES232: dict[str, str] = {}

_RS_SIZES = (8, 16, 32)


# ---------------------------------------------------------------------------
# events_hurst_rs — rescaled-range Hurst estimate per type
# ---------------------------------------------------------------------------


def q_events_hurst_rs(sf_dir: str):
    """Per event type: the R/S Hurst exponent (Hurst 1951; Mandelbrot &
    Wallis 1969) over the HOURLY count series (the 30-day daily series is
    too short for m=16; hourly gives ~720 points so every size fits) —
    for block sizes m ∈ {8,16,32} with m ≤ n/2, average R/S over FULL
    non-overlapping blocks (R = range of cumulative deviations from the
    block mean, S = block population σ; S = 0 blocks drop), then H = OLS
    slope of ln(R/S) on ln m. Output: event_type, n_hours, n_sizes,
    hurst_micro.

    Scale shape: bounded hourly fold; block scans are vectorized
    reshapes on the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["hr"] = (
            (d.year * 10_000 + d.month * 100 + d.day) * 100 + d.hour
        ).astype(np.int64)
        return (
            df.groupby(["event_type", "hr"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    hourly = (
        part.groupby(["event_type", "hr"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "hr"], kind="mergesort")
        if not part.empty
        else part
    )
    cols = ["event_type", "n_hours", "n_sizes", "hurst_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if hourly.empty:
        return empty
    rows = []
    for et, sub in hourly.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        n = len(y)
        pts = []
        for m in _RS_SIZES:
            if m > n // 2:
                continue
            k = n // m
            blk = y[: k * m].reshape(k, m)
            mu = blk.sum(axis=1) / m
            dev = blk - mu[:, None]
            cum = np.cumsum(dev, axis=1)
            r = cum.max(axis=1) - cum.min(axis=1)
            s = np.sqrt((dev * dev).sum(axis=1) / m)
            ok = s > 0.0
            if not ok.any():
                continue
            rs = (r[ok] / s[ok]).sum() / float(ok.sum())
            if rs <= 0.0:
                continue
            pts.append((np.log(float(m)), np.log(rs)))
        if len(pts) < 2:
            continue
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        np_ = float(len(xs))
        sxx_c = (xs * xs).sum() - xs.sum() * xs.sum() / np_
        sxy_c = (xs * ys).sum() - xs.sum() * ys.sum() / np_
        if sxx_c <= 0.0:
            continue
        h = sxy_c / sxx_c
        rows.append(
            (et, np.int64(n), np.int64(len(pts)),
             np.int64(np.floor(h * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


_SIZES_SQL = ", ".join(str(m) for m in _RS_SIZES)

ORACLES232["events_hurst_rs"] = f"""
WITH hourly AS (
  SELECT event_type,
         CAST((year(ts) * 10000 + month(ts) * 100 + day(ts)) * 100
              + hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) - 1 AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
sizes AS (SELECT unnest([{_SIZES_SQL}]) AS m),
blk AS (
  SELECT idx.event_type, sizes.m, idx.t // sizes.m AS b, idx.t, idx.y,
         idx.n
  FROM idx JOIN sizes ON sizes.m <= idx.n // 2
  WHERE idx.t < (idx.n // sizes.m) * sizes.m
),
bstat AS (
  SELECT event_type, m, b, sum(y) / m AS mu,
         any_value(n) AS n
  FROM blk GROUP BY 1, 2, 3
),
dev AS (
  SELECT blk.event_type, blk.m, blk.b, blk.t,
         blk.y - bstat.mu AS d
  FROM blk JOIN bstat ON blk.event_type = bstat.event_type
       AND blk.m = bstat.m AND blk.b = bstat.b
),
cum AS (
  SELECT event_type, m, b,
         sum(d) OVER (PARTITION BY event_type, m, b ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c,
         d
  FROM dev
),
rs AS (
  SELECT event_type, m, b,
         max(c) - min(c) AS r,
         sqrt(sum(d * d) / m) AS s
  FROM cum GROUP BY 1, 2, 3
),
pts AS (
  SELECT event_type, m, sum(r / s) / count(*) AS rsavg
  FROM rs WHERE s > 0.0 GROUP BY 1, 2
),
lp AS (
  SELECT event_type, ln(CAST(m AS DOUBLE)) AS x, ln(rsavg) AS y
  FROM pts WHERE rsavg > 0.0
),
ols AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS np,
         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM lp GROUP BY 1 HAVING count(*) >= 2
),
nn AS (SELECT DISTINCT event_type, n FROM idx)
SELECT ols.event_type,
       CAST(nn.n AS BIGINT) AS n_hours,
       CAST(ols.np AS BIGINT) AS n_sizes,
       CAST(floor((sxy - sx * sy / np) / (sxx - sx * sx / np)
                  * 1000000.0 + 0.5) AS BIGINT) AS hurst_micro
FROM ols JOIN nn ON ols.event_type = nn.event_type
WHERE sxx - sx * sx / np > 0.0
ORDER BY ols.event_type"""


# ---------------------------------------------------------------------------
# events_recurrence_quantification — RR and DET of the daily series
# ---------------------------------------------------------------------------


def q_events_recurrence_quantification(sf_dir: str):
    """Recurrence quantification (Zbilut & Webber 1992) of the daily count
    series: points i < j recur when |y_i − y_j| ≤ 0.1σ; RR = recurrent
    pairs / all pairs; DET = share of recurrent pairs whose diagonal
    successor (i+1, j+1) also recurs. Output: event_type, n_days, n_rec,
    rr_micro, det_micro.

    Scale shape: bounded daily fold; the O(n²) pair matrix on the
    driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_days", "n_rec", "rr_micro", "det_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        n = len(y)
        if n < 4:
            continue
        mu = y.sum() / n
        sd = np.sqrt(max((y * y).sum() / n - mu * mu, 0.0))
        if sd <= 0.0:
            continue
        eps = 0.1 * sd
        rec = np.abs(y[:, None] - y[None, :]) <= eps
        iu = np.triu_indices(n, 1)
        total_pairs = len(iu[0])
        r = rec[iu]
        n_rec = int(r.sum())
        # diagonal successors among strictly-upper pairs with i+1,j+1 valid
        ii, jj = iu
        valid = (ii + 1 < n) & (jj + 1 < n)
        succ = np.zeros(total_pairs, dtype=bool)
        succ[valid] = rec[ii[valid] + 1, jj[valid] + 1]
        n_det = int((r & succ).sum())
        rr = n_rec / float(total_pairs)
        det = n_det / float(n_rec) if n_rec > 0 else 0.0
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append((et, np.int64(n), np.int64(n_rec), micro(rr), micro(det)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES232["events_recurrence_quantification"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
st AS (
  SELECT event_type,
         0.1 * sqrt(greatest(sum(y * y) / count(*)
              - (sum(y) / count(*)) * (sum(y) / count(*)), 0.0)) AS eps,
         count(*) AS n
  FROM daily GROUP BY 1 HAVING count(*) >= 4
),
p AS (
  SELECT a.event_type, a.t AS i, b.t AS j,
         CASE WHEN abs(a.y - b.y) <= st.eps THEN 1 ELSE 0 END AS rec
  FROM idx a
  JOIN idx b ON a.event_type = b.event_type AND b.t > a.t
  JOIN st ON a.event_type = st.event_type
  WHERE st.eps > 0.0
),
d AS (
  SELECT p.event_type, p.rec,
         coalesce(q.rec, 0) AS succ
  FROM p LEFT JOIN p q ON q.event_type = p.event_type
       AND q.i = p.i + 1 AND q.j = p.j + 1
)
SELECT d.event_type,
       CAST(st.n AS BIGINT) AS n_days,
       CAST(sum(d.rec) AS BIGINT) AS n_rec,
       CAST(floor(CAST(sum(d.rec) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
            AS BIGINT) AS rr_micro,
       CAST(floor((CASE WHEN sum(d.rec) > 0
                        THEN CAST(sum(d.rec * d.succ) AS DOUBLE) / sum(d.rec)
                        ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)
         AS det_micro
FROM d JOIN st ON d.event_type = st.event_type
GROUP BY 1, st.n ORDER BY 1"""


QUERIES232 = {
    "events_hurst_rs": q_events_hurst_rs,
    "events_recurrence_quantification": q_events_recurrence_quantification,
}
