"""Driver-contract queries, wave 218 — temporal scan statistic (Kulldorff
LLR over all day windows, elevated clusters only) and the RSI-14 indicator
over daily order counts (simple-average Wilder variant).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES218: dict[str, str] = {}

_RSI_N = 14


# ---------------------------------------------------------------------------
# events_scan_statistic — most anomalous day window per type
# ---------------------------------------------------------------------------


def q_events_scan_statistic(sf_dir: str):
    """Per event type: the day window [s, e] maximizing the Kulldorff
    (1997) Poisson scan LLR n_in·ln(n_in/e_in) + n_out·ln(n_out/e_out)
    (expected counts proportional to window length; elevated windows only,
    n_in > e_in; ties → earliest start, then earliest end). Output:
    event_type, s_day, e_day, n_in, llr_micro.

    Scale shape: bounded daily fold; the O(n²) window scan evaluates from
    exact integer prefix sums on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        return (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "s_day", "e_day", "n_in", "llr_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        x = sub["n"].to_numpy(np.float64)
        day = sub["day"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            continue
        total = x.sum()
        cs = np.concatenate([[0.0], np.cumsum(x)])
        s_idx = np.arange(n)[:, None]
        e_idx = np.arange(n)[None, :]
        n_in = cs[e_idx + 1] - cs[s_idx]
        length = (e_idx - s_idx + 1).astype(np.float64)
        e_in = total * length / n
        valid = (e_idx >= s_idx) & (n_in > e_in) & (length < n)
        with np.errstate(invalid="ignore", divide="ignore"):
            n_out = total - n_in
            e_out = total - e_in
            llr = n_in * np.log(n_in / e_in) + n_out * np.log(n_out / e_out)
        llr = np.where(valid & np.isfinite(llr), llr, -np.inf)
        flat = np.argmax(llr)  # row-major: earliest s wins, then earliest e
        si, ei = np.unravel_index(flat, llr.shape)
        if not np.isfinite(llr[si, ei]):
            continue
        rows.append(
            (
                et, np.int64(day[si]), np.int64(day[ei]),
                np.int64(n_in[si, ei]),
                np.int64(np.floor(llr[si, ei] * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES218["events_scan_statistic"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         sum(n) OVER (PARTITION BY event_type ORDER BY day) AS cs,
         sum(n) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
),
win AS (
  SELECT a.event_type, a.day AS s_day, b.day AS e_day,
         b.cs - (a.cs - a.n) AS n_in,
         a.total * (b.t - a.t + 1) / a.nd AS e_in,
         a.total AS total, a.t AS s_t, b.t AS e_t, a.nd AS nd
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND b.t >= a.t
  WHERE b.t - a.t + 1 < a.nd
),
llr AS (
  SELECT event_type, s_day, e_day, n_in,
         n_in * ln(n_in / e_in)
         + (total - n_in) * ln((total - n_in) / (total - e_in)) AS llr,
         row_number() OVER (PARTITION BY event_type
           ORDER BY n_in * ln(n_in / e_in)
             + (total - n_in) * ln((total - n_in) / (total - e_in)) DESC,
             s_t ASC, e_t ASC) AS r
  FROM win WHERE n_in > e_in AND total - n_in > 0
)
SELECT event_type, s_day, e_day, CAST(n_in AS BIGINT) AS n_in,
       CAST(floor(llr * 1000000.0 + 0.5) AS BIGINT) AS llr_micro
FROM llr WHERE r = 1 ORDER BY event_type"""


# ---------------------------------------------------------------------------
# orders_rsi14 — RSI over daily order counts
# ---------------------------------------------------------------------------


def q_orders_rsi14(sf_dir: str):
    """RSI-14 (simple-average variant) over the daily order-count series:
    per day t ≥ 15, RSI = 100·Σgains₁₄/(Σgains₁₄+Σlosses₁₄) (exact
    rational). One row: n_rsi_days, last_rsi_micro, n_overbought (> 70),
    n_oversold (< 30).

    Scale shape: bounded daily fold + one vectorized sliding-sum scan —
    no shuffle."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        s = pd.Series(t["o_orderdate"].to_numpy(zero_copy_only=False))
        day = (s.dt.year * 10_000 + s.dt.month * 100 + s.dt.day).to_numpy(np.int64)
        return (
            pd.DataFrame({"day": day, "n": 1})
            .groupby("day", sort=False, as_index=False)
            .sum()
            .astype(np.int64)
        )

    part = (
        ray.data.read_parquet(path, columns=["o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_rsi_days", "last_rsi_micro", "n_overbought", "n_oversold"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    daily = part.groupby("day")["n"].sum().sort_index()
    x = daily.to_numpy(np.int64)
    if len(x) < _RSI_N + 2:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    d = np.diff(x)
    gains = np.maximum(d, 0).astype(np.float64)
    losses = np.maximum(-d, 0).astype(np.float64)
    cg = np.concatenate([[0.0], np.cumsum(gains)])
    cl = np.concatenate([[0.0], np.cumsum(losses)])
    # windows of the last 14 diffs ending at diff index i (i >= 13)
    sg = cg[_RSI_N:] - cg[:-_RSI_N]
    sl = cl[_RSI_N:] - cl[:-_RSI_N]
    ok = sg + sl > 0.0
    rsi = 100.0 * sg[ok] / (sg[ok] + sl[ok])
    if len(rsi) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    return pd.DataFrame(
        {
            "n_rsi_days": [np.int64(len(rsi))],
            "last_rsi_micro": [
                np.int64(np.floor(rsi[-1] * 1_000_000.0 + 0.5))
            ],
            "n_overbought": [np.int64(int((rsi > 70.0).sum()))],
            "n_oversold": [np.int64(int((rsi < 30.0).sum()))],
        }
    )


ORACLES218["orders_rsi14"] = f"""
WITH daily AS (
  SELECT CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
              + day(o_orderdate) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
d AS (
  SELECT day, n - lag(n) OVER (ORDER BY day) AS diff,
         row_number() OVER (ORDER BY day) AS t,
         count(*) OVER () AS nd
  FROM daily
),
gl AS (
  SELECT t, nd,
         CAST(greatest(diff, 0) AS DOUBLE) AS g,
         CAST(greatest(-diff, 0) AS DOUBLE) AS l
  FROM d WHERE diff IS NOT NULL
),
win AS (
  SELECT t,
         sum(g) OVER (ORDER BY t ROWS BETWEEN {_RSI_N - 1} PRECEDING
                      AND CURRENT ROW) AS sg,
         sum(l) OVER (ORDER BY t ROWS BETWEEN {_RSI_N - 1} PRECEDING
                      AND CURRENT ROW) AS sl,
         row_number() OVER (ORDER BY t) AS k,
         count(*) OVER () AS m
  FROM gl
),
rsi AS (
  SELECT t, 100.0 * sg / (sg + sl) AS rsi, k, m
  FROM win WHERE k >= {_RSI_N} AND sg + sl > 0.0
)
SELECT CAST(count(*) AS BIGINT) AS n_rsi_days,
       CAST(floor(arg_max(rsi, k) * 1000000.0 + 0.5)
            AS BIGINT) AS last_rsi_micro,
       CAST(sum(CASE WHEN rsi > 70.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overbought,
       CAST(sum(CASE WHEN rsi < 30.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversold
FROM rsi HAVING count(*) > 0"""


QUERIES218 = {
    "events_scan_statistic": q_events_scan_statistic,
    "orders_rsi14": q_orders_rsi14,
}
