"""Driver-contract queries, wave 278 — the Greenwood spacings statistic
over the global event-timestamp sequence (clustering vs uniformity) and
the Schechtman-Yitzhaki Gini correlation between lineitem quantity and
price (exact integer rank-covariance ratios). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES278: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_greenwood — spacings statistic of the global timestamp stream
# ---------------------------------------------------------------------------


def q_events_greenwood(sf_dir: str):
    """Greenwood statistic G = sum d_i^2 / (sum d_i)^2 over the gaps of
    the globally sorted event timestamps (tied timestamps contribute
    zero gaps — the gap multiset is permutation-invariant, so G is
    well-defined). Under uniformity E[G] = 2/(m+1) for m spacings;
    the clustering index is G (m+1)/2. Gap sums are EXACT integers
    (arbitrary precision on the driver, HUGEINT in SQL). One row:
    n_events, span_us, g_micro, cluster_micro.

    Scale shape: ONE Ray range-partitioned sort on ts, then per-block
    (first, last, sum d, sum d^2, n) partials; the driver stitches the
    blocks-bounded boundary gaps in first_ts order."""

    def block_fold(t: pa.Table) -> pd.DataFrame:
        ts = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        if len(ts) == 0:
            return pd.DataFrame(
                {
                    "first": pd.Series([], dtype=np.int64),
                    "last": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                    "d2": pd.Series([], dtype=object),
                }
            )
        d = np.diff(ts)
        d2 = int((d.astype(object) * d.astype(object)).sum()) if len(d) else 0
        return pd.DataFrame(
            {
                "first": [np.int64(ts[0])],
                "last": [np.int64(ts[-1])],
                "n": [np.int64(len(ts))],
                "d2": [d2],
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .sort("ts")
        .map_batches(block_fold, batch_format="pyarrow")
        .to_pandas()  # blocks-bounded partials
        .sort_values("first")
        .reset_index(drop=True)
    )
    cols = ["n_events", "span_us", "g_micro", "cluster_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    n = int(parts["n"].sum())
    if n < 3:
        return empty
    d2_sum = int(sum(int(x) for x in parts["d2"]))
    lasts = parts["last"].to_numpy(np.int64)
    firsts = parts["first"].to_numpy(np.int64)
    bound = firsts[1:] - lasts[:-1]
    d2_sum += int((bound.astype(object) * bound.astype(object)).sum())
    span = int(lasts[-1] - firsts[0])
    if span <= 0:
        return empty
    g = float(d2_sum) / (float(span) * float(span))
    m = n - 1
    cluster = g * float(m + 1) / 2.0
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(span),
                np.int64(np.floor(g * 1_000_000.0 + 0.5)),
                np.int64(np.floor(cluster * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES278["events_greenwood"] = """
WITH s AS (
  SELECT epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (ORDER BY ts) AS prev
  FROM events
),
gaps AS (SELECT CAST(us - prev AS BIGINT) AS d FROM s WHERE prev IS NOT NULL),
agg AS (
  SELECT CAST(count(*) + 1 AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS span,
         CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS d2
  FROM gaps
)
SELECT n AS n_events, span AS span_us,
       CAST(floor(CAST(d2 AS DOUBLE)
                  / (CAST(span AS DOUBLE) * CAST(span AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS g_micro,
       CAST(floor(CAST(d2 AS DOUBLE)
                  / (CAST(span AS DOUBLE) * CAST(span AS DOUBLE))
                  * CAST(n AS DOUBLE) / 2.0
                  * 1000000.0 + 0.5) AS BIGINT) AS cluster_micro
FROM agg
WHERE n >= 3 AND span > 0"""


# ---------------------------------------------------------------------------
# lineitem_gini_correlation — Schechtman-Yitzhaki Gini correlations
# ---------------------------------------------------------------------------


def q_lineitem_gini_correlation(sf_dir: str):
    """Gini correlations between x = quantity (milli) and
    y = extendedprice (cents): Gamma_xy = cov(x, R(y)) / cov(x, R(x))
    and Gamma_yx = cov(y, R(x)) / cov(y, R(y)) with doubled average
    ranks, so each is a ratio of EXACT integers
    (n * sum v R2(w) - sum v * n(n+1), using sum R2 = n(n+1)). One row:
    n, gamma_xy_micro, gamma_yx_micro.

    Scale shape: one tagged per-batch (value -> count, cross-sum)
    combiner per axis; only the bounded distinct-value histograms reach
    the driver (the bounded-cents-histogram precedent), where ranks are
    prefix sums."""

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        gx = (
            pd.DataFrame({"v": x, "o": y})
            .groupby("v", sort=False)
            .agg(n=("o", "size"), s=("o", "sum"))
            .reset_index()
        )
        gx["axis"] = np.int64(0)  # keyed by x, carrying sum of y
        gy = (
            pd.DataFrame({"v": y, "o": x})
            .groupby("v", sort=False)
            .agg(n=("o", "size"), s=("o", "sum"))
            .reset_index()
        )
        gy["axis"] = np.int64(1)  # keyed by y, carrying sum of x
        out = pd.concat([gx, gy], ignore_index=True)
        return out.astype({"n": np.int64, "s": np.int64})

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["axis", "v"])[["n", "s"]]
        .sum()
    )
    cols = ["n", "gamma_xy_micro", "gamma_yx_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty

    def fold(axis: int):
        sub = h.loc[axis].sort_index()
        v = sub.index.to_numpy(np.int64).astype(object)
        nv = sub["n"].to_numpy(np.int64).astype(object)
        sv = sub["s"].to_numpy(np.int64).astype(object)
        below = np.concatenate([[0], np.cumsum(nv)[:-1]])
        r2 = 2 * below + nv + 1
        # own-axis: sum v * r2 weighted by count; cross: sum s * r2
        return (
            int((v * nv).sum()), int((sv).sum()),
            int((v * nv * r2).sum()), int((sv * r2).sum()),
            int(nv.sum()),
        )

    sx, sy_from_x, sxr2x, syr2x, n1 = fold(0)
    sy, sx_from_y, syr2y, sxr2y, n2 = fold(1)
    n = n1
    if n < 2:
        return empty
    k = n * (n + 1)
    num_xy = n * sxr2y - sx * k
    num_xx = n * sxr2x - sx * k
    num_yx = n * syr2x - sy * k
    num_yy = n * syr2y - sy * k
    if num_xx == 0 or num_yy == 0:
        return empty
    g_xy = float(num_xy) / float(num_xx)
    g_yx = float(num_yx) / float(num_yy)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(g_xy * 1_000_000.0 + 0.5)),
                np.int64(np.floor(g_yx * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES278["lineitem_gini_correlation"] = """
WITH base AS (
  SELECT CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
r AS (
  SELECT x, y,
         2 * (rank() OVER (ORDER BY x)) + (count(*) OVER (PARTITION BY x))
           - 1 AS r2x,
         2 * (rank() OVER (ORDER BY y)) + (count(*) OVER (PARTITION BY y))
           - 1 AS r2y
  FROM base
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * r2x) AS HUGEINT) AS sxr2x,
         CAST(sum(CAST(x AS HUGEINT) * r2y) AS HUGEINT) AS sxr2y,
         CAST(sum(CAST(y AS HUGEINT) * r2x) AS HUGEINT) AS syr2x,
         CAST(sum(CAST(y AS HUGEINT) * r2y) AS HUGEINT) AS syr2y
  FROM r
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(CAST(n * sxr2y - sx * (n * (n + 1)) AS DOUBLE)
                  / CAST(n * sxr2x - sx * (n * (n + 1)) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS gamma_xy_micro,
       CAST(floor(CAST(n * syr2x - sy * (n * (n + 1)) AS DOUBLE)
                  / CAST(n * syr2y - sy * (n * (n + 1)) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS gamma_yx_micro
FROM m
WHERE n >= 2
  AND (n * sxr2x - sx * (n * (n + 1))) <> 0
  AND (n * syr2y - sy * (n * (n + 1))) <> 0"""


QUERIES278 = {
    "events_greenwood": q_events_greenwood,
    "lineitem_gini_correlation": q_lineitem_gini_correlation,
}
