"""Driver-contract queries, wave 53 — autocorrelation of the hourly event
series (the seasonality probe behind capacity planning and anomaly baselines)
and the Hill tail-index estimator (the heavy-tail diagnostic for spend /
latency distributions). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES53: dict[str, str] = {}

_ACF_MAX_LAG = 24
_HOUR_US = 3_600_000_000
_HILL_K = 100


# ---------------------------------------------------------------------------
# events_acf — autocorrelation of the zero-filled hourly count series
# ---------------------------------------------------------------------------


def q_events_acf(sf_dir: str):
    """ACF of the dense (zero-filled) hourly event-count series at lags
    1..24. Float sums over thousands of terms are order-dependent, so both
    sides use EXACT integer algebra: with S = Σx and n hours, the lag-k
    autocovariance numerator scaled by n² is Σ(n·xᵢ−S)(n·xᵢ₊ₖ−S) — computed
    in arbitrary-precision ints (Python / HUGEINT), divided once as floats.

    Scale shape: one (hour → count) combiner per batch, ONE tiny exchange
    (bounded by the calendar-hour domain), dense-grid ACF on the driver over
    that bounded series. Rows never shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        hrs = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        h = pd.Series(hrs).groupby(hrs).size()
        return pa.table(
            {
                "hr": pa.array(h.index.to_numpy(np.int64)),
                "cnt": pa.array(h.to_numpy(np.int64)),
            }
        )

    hrs = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: calendar-hour domain
        .groupby("hr")["cnt"]
        .sum()
    )
    h0, h1 = int(hrs.index.min()), int(hrs.index.max())
    x = np.zeros(h1 - h0 + 1, dtype=np.int64)
    x[hrs.index.to_numpy(np.int64) - h0] = hrs.to_numpy(np.int64)
    n = len(x)
    S = int(x.sum())
    d = [int(n) * int(v) - S for v in x]  # exact ints, bounded array
    den = sum(v * v for v in d)
    rows = []
    for k in range(1, _ACF_MAX_LAG + 1):
        num = sum(a * b for a, b in zip(d[:-k], d[k:])) if k < n else 0
        acf = float(num) / float(den) if den else 0.0
        rows.append((k, int(np.floor(acf * 1e6 + 0.5))))
    return pd.DataFrame(
        {
            "lag": np.array([r[0] for r in rows], np.int64),
            "acf_micro": np.array([r[1] for r in rows], np.int64),
            "n_hours": np.full(len(rows), n, np.int64),
        }
    )


ORACLES53["events_acf"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  -- range() takes only constant args: over-generate a 200k-hour (~22 y)
  -- constant span and trim to the observed one
  SELECT g.h0 + CAST(r.range AS BIGINT) AS hr
  FROM g CROSS JOIN range(0, 200000) r
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.hr, CAST(coalesce(h.cnt, 0) AS HUGEINT) AS cnt
  FROM grid LEFT JOIN h USING (hr)
),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(cnt) AS s FROM x),
d AS (SELECT hr, m.n * cnt - m.s AS dv FROM x, m),
den AS (SELECT sum(dv * dv) AS den FROM d),
lags AS (SELECT CAST(r.range AS BIGINT) AS lag FROM range(1, {_ACF_MAX_LAG + 1}) r),
num AS (
  SELECT l.lag, coalesce(sum(a.dv * b.dv), 0) AS num
  FROM lags l
  LEFT JOIN d a ON TRUE
  LEFT JOIN d b ON b.hr = a.hr + l.lag
  GROUP BY l.lag
)
SELECT l.lag,
       CAST(floor(CASE WHEN den.den = 0 THEN 0.0
                       ELSE CAST(n2.num AS DOUBLE) / CAST(den.den AS DOUBLE)
                  END * 1000000 + 0.5) AS BIGINT) AS acf_micro,
       CAST((SELECT h1 - h0 + 1 FROM g) AS BIGINT) AS n_hours
FROM lags l JOIN num n2 USING (lag) CROSS JOIN den
ORDER BY l.lag"""


# ---------------------------------------------------------------------------
# orders_hill_tail — Hill tail-index estimator over order totals
# ---------------------------------------------------------------------------


def q_orders_hill_tail(sf_dir: str):
    """Hill estimator of the right-tail index of order totals:
    H = (1/k)·Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k = min(100, n−1) largest
    values (integer cents; equal values make the float sum permutation-safe).
    Estimated tail exponent α = 1/H — the "how heavy is the whale tail"
    number behind sampling and capping decisions.

    Scale shape: per-batch ``np.partition`` top-(k+1) partials (k+1 scalars
    per block), driver merge of the bounded partial set, ln-sum in descending
    rank order (sequential cumsum ≡ DuckDB ordered list_sum)."""

    K = _HILL_K

    def topk(t: pa.Table) -> pa.Table:
        # count + per-block top-(k+1) in one pass: both ride the partial
        n_in = len(t)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        if len(cents) > K + 1:
            cents = np.partition(cents, len(cents) - (K + 1))[-(K + 1):]
        nb = np.zeros(len(cents), np.int64)
        nb[0] = n_in
        return pa.table({"cents": pa.array(cents), "n_block": pa.array(nb)})

    parts = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(topk, batch_format="pyarrow")
        .to_pandas()  # bounded: (K+1) rows per block
    )
    n = int(parts["n_block"].sum())
    k = min(K, n - 1)
    top = np.sort(parts["cents"].to_numpy(np.int64))[::-1][: k + 1]
    xb = int(top[k])
    lnr = np.log(top[:k].astype(np.float64) / float(xb))
    s = float(np.cumsum(lnr)[-1]) if k else 0.0  # sequential ≡ list_sum order
    hill = s / k if k else 0.0
    return pd.DataFrame(
        {
            "n_tail": [np.int64(k)],
            "x_tail_cents": [np.int64(xb)],
            "hill_micro": [np.int64(np.floor(hill * 1e6 + 0.5))],
            "alpha_micro": [
                np.int64(np.floor((1.0 / hill if hill else 0.0) * 1e6 + 0.5))
            ],
        }
    )


ORACLES53["orders_hill_tail"] = f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
),
k AS (SELECT least({_HILL_K}, count(*) - 1) AS k FROM c),
top AS (
  SELECT cents, row_number() OVER (ORDER BY cents DESC) AS rn FROM c
),
b AS (SELECT top.cents AS xb FROM top, k WHERE rn = k.k + 1),
s AS (
  SELECT list_sum(list(ln(top.cents * 1.0 / b.xb) ORDER BY rn)) AS s
  FROM top, b, k WHERE rn <= k.k
)
SELECT CAST(k.k AS BIGINT) AS n_tail,
       CAST(b.xb AS BIGINT) AS x_tail_cents,
       CAST(floor(s.s / k.k * 1000000 + 0.5) AS BIGINT) AS hill_micro,
       CAST(floor(CASE WHEN s.s = 0 THEN 0.0 ELSE k.k * 1.0 / s.s END
                  * 1000000 + 0.5) AS BIGINT) AS alpha_micro
FROM k, b, s"""


QUERIES53 = {
    "events_acf": q_events_acf,
    "orders_hill_tail": q_orders_hill_tail,
}
