"""Driver-contract queries, wave 285 — the mean-residual-life curve of
global interarrival gaps at quartile thresholds (exact integer
conditional sums over the millisecond gap histogram) and the KPSS
level-stationarity test on monthly lineitem revenue (exact scaled
partial sums). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES285: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_mean_residual_life — MRL of interarrival gaps at quartiles
# ---------------------------------------------------------------------------


def q_events_mean_residual_life(sf_dir: str):
    """Mean residual life of global interarrival gaps (milliseconds,
    gap_ms = gap_us // 1000): at each gap quartile threshold t_q
    (k-th order statistic, k = ceil(q m)), MRL(t) = sum_{d > t} (d - t)
    / |{d > t}| — EXACT integer conditional sums over the gap
    histogram. An exponential stream has flat MRL; increasing MRL means
    heavy-tailed silence. Per quartile: q_pct, t_ms, n_exceed,
    mrl_milli.

    Scale shape: gaps come from the sorted-block boundary stitch of
    `events_greenwood`, folded per block into a millisecond histogram
    (gap quantization bounds the distinct domain); the driver scans
    prefix sums."""

    def block_fold(t: pa.Table) -> pd.DataFrame:
        ts = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        if len(ts) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ("g", "c", "first", "last")}
            )
        out = {"first": [np.int64(ts[0])], "last": [np.int64(ts[-1])]}
        d = (np.diff(ts) // 1000) if len(ts) > 1 else np.array([], np.int64)
        h = pd.Series(d).groupby(d).size() if len(d) else pd.Series(dtype=int)
        hist = pd.DataFrame(
            {
                "g": h.index.to_numpy(np.int64),
                "c": h.to_numpy(np.int64),
                "first": np.int64(-1),
                "last": np.int64(-1),
            }
        )
        head = pd.DataFrame(
            {
                "g": np.int64(-1),
                "c": np.int64(0),
                "first": out["first"],
                "last": out["last"],
            }
        )
        return pd.concat([head, hist], ignore_index=True)

    parts = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .sort("ts")
        .map_batches(block_fold, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["q_pct", "t_ms", "n_exceed", "mrl_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    heads = parts[parts["g"] == -1].sort_values("first")
    hist = (
        parts[parts["g"] >= 0].groupby("g")["c"].sum().to_dict()
    )
    # boundary gaps between consecutive sorted blocks
    firsts = heads["first"].to_numpy(np.int64)
    lasts = heads["last"].to_numpy(np.int64)
    for b in (firsts[1:] - lasts[:-1]) // 1000:
        hist[int(b)] = hist.get(int(b), 0) + 1
    if not hist:
        return empty
    g = np.array(sorted(hist), np.int64)
    c = np.array([hist[int(x)] for x in g], np.int64)
    m = int(c.sum())
    cum = np.cumsum(c)
    # suffix sums for exact conditional tails
    sv = (g.astype(object) * c.astype(object))
    suffix_cnt = m - cum
    suffix_sum = int(sv.sum()) - np.cumsum(sv)
    rows = []
    for q in (25, 50, 75):
        k = (q * m + 99) // 100  # ceil(q% of m)
        i = int(np.searchsorted(cum, k, side="left"))
        t = int(g[i])
        n_ex = int(suffix_cnt[i])
        if n_ex == 0:
            continue
        s_ex = int(suffix_sum[i])
        mrl = (float(s_ex) - float(t) * float(n_ex)) / float(n_ex)
        rows.append(
            (
                np.int64(q), np.int64(t), np.int64(n_ex),
                np.int64(np.floor(mrl * 1_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c_: np.int64 for c_ in cols}
    )


ORACLES285["events_mean_residual_life"] = """
WITH s AS (
  SELECT epoch_us(ts) AS us, lag(epoch_us(ts)) OVER (ORDER BY ts) AS prev
  FROM events
),
gaps AS (
  SELECT CAST((us - prev) // 1000 AS BIGINT) AS d
  FROM s WHERE prev IS NOT NULL
),
h AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM gaps GROUP BY 1),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS m FROM h),
cum AS (SELECT d, c, sum(c) OVER (ORDER BY d) AS cc FROM h),
qs AS (SELECT CAST(u.q AS BIGINT) AS q
       FROM (SELECT unnest([25, 50, 75]) AS q) u),
thr AS (
  SELECT qs.q, min(cum.d) AS t
  FROM qs, nn JOIN cum ON cum.cc * 100 >= qs.q * nn.m
  GROUP BY 1
),
tail AS (
  SELECT thr.q, thr.t,
         CAST(sum(CASE WHEN h.d > thr.t THEN h.c ELSE 0 END) AS BIGINT)
           AS n_ex,
         CAST(sum(CASE WHEN h.d > thr.t THEN (h.d - thr.t) * h.c
                       ELSE 0 END) AS BIGINT) AS resid
  FROM thr CROSS JOIN h
  GROUP BY 1, 2
)
SELECT q AS q_pct, t AS t_ms, n_ex AS n_exceed,
       CAST(floor(CAST(resid AS DOUBLE) / CAST(n_ex AS DOUBLE)
                  * 1000.0 + 0.5) AS BIGINT) AS mrl_milli
FROM tail
WHERE n_ex > 0
ORDER BY q"""


# ---------------------------------------------------------------------------
# lineitem_kpss_level — KPSS stationarity of monthly revenue
# ---------------------------------------------------------------------------


def q_lineitem_kpss_level(sf_dir: str):
    """KPSS level-stationarity test on the monthly revenue series
    (cents, calendar months between first and last shipment,
    zero-filled): with scaled partial sums A_t = n cum_t - t T (EXACT
    integers), KPSS = sum A_t^2 / (n^2 (n sum y^2 - T^2)) — one
    division; reject level stationarity at 5% when KPSS > 0.463 (the
    complement of `events_dickey_fuller`). One row: n_months,
    kpss_micro, reject_5pct.

    Scale shape: per-batch (month -> revenue cents) combiner; the
    bounded calendar series folds on the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        cents = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        ym = (
            df["l_shipdate"].dt.year.to_numpy(np.int64) * 12
            + df["l_shipdate"].dt.month.to_numpy(np.int64) - 1
        )
        g = pd.DataFrame({"ym": ym, "s": cents}).groupby("ym")["s"].sum()
        return pd.DataFrame(
            {"ym": g.index.to_numpy(np.int64), "s": g.to_numpy(np.int64)}
        )

    months = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("ym")["s"]
        .sum()
    )
    cols = ["n_months", "kpss_micro", "reject_5pct"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if months.empty:
        return empty
    m0, m1 = int(months.index.min()), int(months.index.max())
    n = m1 - m0 + 1
    if n < 2:
        return empty
    y = np.zeros(n, dtype=object)
    for ym, s in months.items():
        y[int(ym) - m0] = int(s)
    T = int(sum(y))
    s2 = int(sum(v * v for v in y))
    cum = np.cumsum(y)
    t_idx = np.arange(1, n + 1, dtype=object)
    A = n * cum - t_idx * T
    sa2 = int((A * A).sum())
    den = n * s2 - T * T
    if den <= 0:
        return empty
    kpss = float(sa2) / (float(n) * float(n) * float(den))
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(kpss * 1_000_000.0 + 0.5)),
                np.int64(1 if kpss > 0.463 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES285["lineitem_kpss_level"] = """
WITH mrev AS (
  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
           AS ym,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem GROUP BY 1
),
g AS (SELECT min(ym) AS m0, max(ym) AS m1 FROM mrev),
grid AS (
  SELECT g.m0 + CAST(r.range AS BIGINT) AS ym,
         CAST(r.range AS BIGINT) + 1 AS t
  FROM g CROSS JOIN range(0, 4000) r
  WHERE r.range <= g.m1 - g.m0
),
x AS (
  SELECT grid.t, CAST(coalesce(mrev.s, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN mrev USING (ym)
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS tt,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
a AS (
  SELECT x.t,
         CAST(nn.n AS HUGEINT) * (sum(x.y) OVER (ORDER BY x.t))
           - CAST(x.t AS HUGEINT) * nn.tt AS av
  FROM x, nn
),
sa AS (SELECT CAST(sum(av * av) AS HUGEINT) AS sa2 FROM a)
SELECT nn.n AS n_months,
       CAST(floor(CAST(sa.sa2 AS DOUBLE)
                  / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                     * CAST(nn.n * nn.s2 - CAST(nn.tt AS HUGEINT) * nn.tt
                            AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS kpss_micro,
       CAST(CASE WHEN CAST(sa.sa2 AS DOUBLE)
                      / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                         * CAST(nn.n * nn.s2
                                - CAST(nn.tt AS HUGEINT) * nn.tt AS DOUBLE))
                      > 0.463
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
FROM nn, sa
WHERE nn.n >= 2
  AND CAST(nn.n * nn.s2 - CAST(nn.tt AS HUGEINT) * nn.tt AS DOUBLE) > 0"""


QUERIES285 = {
    "events_mean_residual_life": q_events_mean_residual_life,
    "lineitem_kpss_level": q_lineitem_kpss_level,
}
