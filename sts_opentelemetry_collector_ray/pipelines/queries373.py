"""Driver-contract queries, wave 373 — a CUSUM change-detector alarm
census over daily event counts (integer prefix-sum/running-min core
after one mirrored reference rounding) and the mutual information
between lineitem discount and quantity levels. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES373: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_cusum_alarm_census — one-sided CUSUM on daily counts
# ---------------------------------------------------------------------------


def q_events_cusum_alarm_census(sf_dir: str):
    """One-sided CUSUM: with the zero-filled daily series, reference
    ref_milli = floor((mean + 0.5 sd) * 1000 + 0.5) (the only float,
    rounded ONCE identically on both sides), the statistic
    S+(t) = P(t) - min_{i<=t} P(i) over the integer prefix sums of
    1000*x - ref_milli is exact; alarms where S+ > h_milli =
    floor(5 sd * 1000 + 0.5). One row: n_days, ref_milli, h_milli,
    n_alarms, max_cusum_milli."""

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
    cols = ["n_days", "ref_milli", "h_milli", "n_alarms",
            "max_cusum_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if daily.empty:
        return empty
    d0, d1 = int(daily.index.min()), int(daily.index.max())
    n = d1 - d0 + 1
    if n < 10:
        return empty
    x = np.zeros(n, np.int64)
    x[daily.index.to_numpy(np.int64) - d0] = daily.to_numpy(np.int64)
    xo = x.astype(object)
    s = int(xo.sum())
    s2 = int((xo * xo).sum())
    var = (float(s2) - float(s) * float(s) / float(n)) / float(n)
    if var <= 0.0:
        return empty
    sd = float(np.sqrt(var))
    mean = float(s) / float(n)
    ref = int(np.floor((mean + 0.5 * sd) * 1_000.0 + 0.5))
    h_m = int(np.floor(5.0 * sd * 1_000.0 + 0.5))
    p = np.cumsum(1000 * xo - ref)
    # min over {0, P(0..t)} — the 0 seed is the empty prefix
    run_min = np.minimum.accumulate(np.concatenate([[0], p]))[1:]
    s_plus = p - run_min
    alarms = int(sum(1 for v in s_plus if int(v) > h_m))
    mx = int(max(int(v) for v in s_plus))
    if mx < 0:
        mx = 0
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(ref), np.int64(h_m),
                np.int64(alarms), np.int64(mx),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES373["events_cusum_alarm_census"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(d) AS d0, max(d) AS d1 FROM h),
grid AS (
  SELECT CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 100000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.d = (SELECT d0 FROM g) + grid.t
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
params AS (
  SELECT n,
         CAST(floor((CAST(s AS DOUBLE) / n
                     + 0.5 * sqrt((CAST(s2 AS DOUBLE)
                                   - CAST(s AS DOUBLE) * s / n) / n))
                    * 1000.0 + 0.5) AS BIGINT) AS ref,
         CAST(floor(5.0 * sqrt((CAST(s2 AS DOUBLE)
                                - CAST(s AS DOUBLE) * s / n) / n)
                    * 1000.0 + 0.5) AS BIGINT) AS hm,
         (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n AS var
  FROM nn
),
pref AS (
  SELECT x.t,
         sum(1000 * x.y - params.ref)
           OVER (ORDER BY x.t ROWS UNBOUNDED PRECEDING) AS p
  FROM x, params
),
cusum AS (
  SELECT t, p,
         p - least(0, min(p) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
           AS sp
  FROM pref
),
f AS (
  SELECT params.n, params.ref, params.hm,
         (SELECT CAST(sum(CASE WHEN cusum.sp > params.hm
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM cusum) AS alarms,
         (SELECT CAST(greatest(max(sp), 0) AS BIGINT) FROM cusum) AS mx
  FROM params
  WHERE params.n >= 10 AND params.var > 0
)
SELECT n AS n_days, ref AS ref_milli, hm AS h_milli,
       alarms AS n_alarms, mx AS max_cusum_milli
FROM f"""


# ---------------------------------------------------------------------------
# lineitem_discount_quantity_mi — MI between discount and quantity
# ---------------------------------------------------------------------------


def q_lineitem_discount_quantity_mi(sf_dir: str):
    """Are discount depth and order quantity informative about each
    other? Exact joint counts over the bounded (discount milli,
    quantity) table; MI = ln N - (S1 + S3 - S13)/N with S = sum c ln c
    and normalization by sqrt(H1 H3). One row: n, n_disc_levels,
    n_qty_levels, mi_micro, nmi_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        disc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        qty = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"d": disc, "q": qty})
            .groupby(["d", "q"])
            .size()
            .rename("c")
            .reset_index()
        )
        return g.astype(np.int64)

    joint = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["d", "q"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n", "n_disc_levels", "n_qty_levels", "mi_micro", "nmi_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if joint.empty:
        return empty
    n = int(joint["c"].sum())
    if n < 2:
        return empty

    def s_of(series: pd.Series) -> float:
        v = series.to_numpy(np.int64).astype(np.float64)
        return float((v * np.log(v)).sum())

    s13 = s_of(joint["c"])
    m1 = joint.groupby("d")["c"].sum()
    m3 = joint.groupby("q")["c"].sum()
    s1 = s_of(m1)
    s3 = s_of(m3)
    ln_n = float(np.log(float(n)))
    mi = ln_n - (s1 + s3 - s13) / float(n)
    h1 = ln_n - s1 / float(n)
    h3 = ln_n - s3 / float(n)
    if h1 <= 0.0 or h3 <= 0.0:
        return empty
    nmi = mi / (float(np.sqrt(h1)) * float(np.sqrt(h3)))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(len(m1)), np.int64(len(m3)),
                np.int64(np.floor(mi * 1_000_000.0 + 0.5)),
                np.int64(np.floor(nmi * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES373["lineitem_discount_quantity_mi"] = """
WITH w AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS d,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
  FROM lineitem
),
j AS (SELECT d, q, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
m1 AS (SELECT d, CAST(sum(c) AS BIGINT) AS c FROM j GROUP BY 1),
m3 AS (SELECT q, CAST(sum(c) AS BIGINT) AS c FROM j GROUP BY 1),
s AS (
  SELECT
    (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM j) AS s13,
    (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM m1) AS s1,
    (SELECT sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) FROM m3) AS s3,
    (SELECT CAST(count(*) AS BIGINT) FROM m1) AS k1,
    (SELECT CAST(count(*) AS BIGINT) FROM m3) AS k3,
    nn.n
  FROM nn
),
h AS (
  SELECT n, k1, k3,
         ln(CAST(n AS DOUBLE)) - (s1 + s3 - s13) / n AS mi,
         ln(CAST(n AS DOUBLE)) - s1 / n AS h1,
         ln(CAST(n AS DOUBLE)) - s3 / n AS h3
  FROM s
)
SELECT n, k1 AS n_disc_levels, k3 AS n_qty_levels,
       CAST(floor(mi * 1000000.0 + 0.5) AS BIGINT) AS mi_micro,
       CAST(floor(mi / (sqrt(h1) * sqrt(h3)) * 1000000.0 + 0.5)
            AS BIGINT) AS nmi_micro
FROM h
WHERE n >= 2 AND h1 > 0 AND h3 > 0"""


QUERIES373 = {
    "events_cusum_alarm_census": q_events_cusum_alarm_census,
    "lineitem_discount_quantity_mi": q_lineitem_discount_quantity_mi,
}
