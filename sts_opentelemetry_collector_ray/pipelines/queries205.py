"""Driver-contract queries, wave 205 — local-level Kalman filter over the
daily count series (fixed Q/R, replayed step-exact in a recursive CTE) and
an optimal second-price reserve search over a fixed price grid.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES205: dict[str, str] = {}

_KF_Q, _KF_R = 10.0, 100.0
_RP_STEP = 1_000.0
_RP_MAX_K = 500


# ---------------------------------------------------------------------------
# events_kalman_filter — local-level filter over daily counts
# ---------------------------------------------------------------------------


def q_events_kalman_filter(sf_dir: str):
    """Per event type: a local-level Kalman filter over the daily count
    series (x̂₀ = first day, p₀ = 1, Q = 10, R = 100; p⁺ = p+Q,
    k = p⁺/(p⁺+R), x̂ += k·innov, p = (1−k)p⁺). The SQL oracle replays the
    recursion STEP-EXACTLY via a recursive CTE — identical op order, so the
    strict gate sees bit-equal floats. Output: event_type, n_days,
    level_micro, p_micro, k_micro, rmse_micro (√(Σinnov²/(n−1))).

    Scale shape: bounded daily fold; the recursion is inherently sequential
    per type and runs on |days|-sized driver arrays — no shuffle."""
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
    cols = ["event_type", "n_days", "level_micro", "p_micro", "k_micro", "rmse_micro"]
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
        y = sub["n"].to_numpy(np.float64)
        n = len(y)
        if n < 2:
            continue
        x, p, sse, k = float(y[0]), 1.0, 0.0, 0.0
        for t in range(1, n):
            p_pred = p + _KF_Q
            k = p_pred / (p_pred + _KF_R)
            innov = y[t] - x
            x = x + k * innov
            sse = sse + innov * innov
            p = (1.0 - k) * p_pred
        rmse = np.sqrt(sse / (n - 1.0))
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (et, np.int64(n), micro(x), micro(p), micro(k), micro(rmse))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES205["events_kalman_filter"] = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
),
kal AS (
  SELECT event_type, t, nd, n AS x, CAST(1.0 AS DOUBLE) AS p,
         CAST(0.0 AS DOUBLE) AS sse, CAST(0.0 AS DOUBLE) AS k
  FROM idx WHERE t = 1 AND nd >= 2
  UNION ALL
  SELECT d.event_type, d.t, kal.nd,
         kal.x + ((kal.p + {_KF_Q}) / ((kal.p + {_KF_Q}) + {_KF_R}))
               * (d.n - kal.x),
         (1.0 - (kal.p + {_KF_Q}) / ((kal.p + {_KF_Q}) + {_KF_R}))
           * (kal.p + {_KF_Q}),
         kal.sse + (d.n - kal.x) * (d.n - kal.x),
         (kal.p + {_KF_Q}) / ((kal.p + {_KF_Q}) + {_KF_R})
  FROM kal JOIN idx d ON d.event_type = kal.event_type AND d.t = kal.t + 1
)
SELECT event_type, CAST(nd AS BIGINT) AS n_days,
       CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS level_micro,
       CAST(floor(p * 1000000.0 + 0.5) AS BIGINT) AS p_micro,
       CAST(floor(k * 1000000.0 + 0.5) AS BIGINT) AS k_micro,
       CAST(floor(sqrt(sse / (nd - 1.0)) * 1000000.0 + 0.5) AS BIGINT)
         AS rmse_micro
FROM kal WHERE t = nd ORDER BY event_type"""


# ---------------------------------------------------------------------------
# orders_reserve_price — grid search for the revenue-optimal reserve
# ---------------------------------------------------------------------------


def q_orders_reserve_price(sf_dir: str):
    """Monopoly reserve-price grid search (Myerson 1981 empirical form):
    over candidates r = k·1000 (k = 1..500), expected revenue per bidder
    r·P(price ≥ r); report the top-5 candidates (revenue DESC, r ASC).
    Output: r, n_geq, exp_rev_micro.

    Scale shape: one per-batch 501-bin histogram combiner; the suffix-sum
    grid search runs on the driver — no shuffle."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        p = np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False), np.float64)
        b = np.minimum(np.floor(p / _RP_STEP), float(_RP_MAX_K)).astype(np.int64)
        df = pd.DataFrame({"bin": b, "n": 1})
        return df.groupby("bin", sort=False, as_index=False).sum().astype(np.int64)

    part = (
        ray.data.read_parquet(path, columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["r", "n_geq", "exp_rev_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    hist = np.zeros(_RP_MAX_K + 1, np.int64)
    g = part.groupby("bin")["n"].sum()
    hist[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    n = float(hist.sum())
    suffix = np.cumsum(hist[::-1])[::-1]  # suffix[k] = #(bin >= k)
    k = np.arange(1, _RP_MAX_K + 1, dtype=np.int64)
    cnt = suffix[1:]
    rev = k.astype(np.float64) * _RP_STEP * cnt.astype(np.float64) / n
    df = pd.DataFrame(
        {
            "r": (k * np.int64(int(_RP_STEP))).astype(np.int64),
            "n_geq": cnt.astype(np.int64),
            "exp_rev_micro": np.floor(rev * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )
    df = df.sort_values(
        ["exp_rev_micro", "r"], ascending=[False, True], kind="mergesort"
    ).head(5)
    return df.reset_index(drop=True).astype(np.int64)


ORACLES205["orders_reserve_price"] = f"""
WITH b AS (
  SELECT least(CAST(floor(o_totalprice / {_RP_STEP}) AS BIGINT),
               {_RP_MAX_K}) AS bin
  FROM orders
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b),
grid AS (SELECT CAST(u.range AS BIGINT) AS k FROM range(1, {_RP_MAX_K + 1}) u),
cnt AS (
  SELECT grid.k,
         CAST((SELECT count(*) FROM b WHERE b.bin >= grid.k) AS BIGINT)
           AS n_geq
  FROM grid
)
SELECT CAST(cnt.k * {int(_RP_STEP)} AS BIGINT) AS r, cnt.n_geq,
       CAST(floor(CAST(cnt.k AS DOUBLE) * {_RP_STEP}
                  * CAST(cnt.n_geq AS DOUBLE) / tot.n
                  * 1000000.0 + 0.5) AS BIGINT) AS exp_rev_micro
FROM cnt, tot ORDER BY exp_rev_micro DESC, r ASC LIMIT 5"""


QUERIES205 = {
    "events_kalman_filter": q_events_kalman_filter,
    "orders_reserve_price": q_orders_reserve_price,
}
