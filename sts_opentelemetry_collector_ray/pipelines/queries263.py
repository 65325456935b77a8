"""Driver-contract queries, wave 263 — the Lorenz concentration curve of
order values at decile ranks (the curve behind the Gini/top-share metrics
already in the catalog) and classical moving-average seasonal decomposition
(the ratio-to-moving-average method, additive form) of the daily event
series. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES263: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# orders_lorenz_curve — cumulative value share at decile ranks
# ---------------------------------------------------------------------------


def q_orders_lorenz_curve(sf_dir: str):
    """Lorenz curve: orders sorted by total price ascending; at each decile
    rank k_q = ⌈q·N/10⌉ the cumulative value is (full cent-blocks below the
    boundary value) + (k − count_below)·v — EXACT integers because tied
    ranks share the same value; share = cum/T is the single division.
    Per decile: decile, k_rank, cum_cents, share_micro.

    Scale shape: per-batch (cents → count) combiner; only the bounded
    distinct-cents histogram reaches the driver (the
    `events_quantiles_exact` idiom); the decile scan is a prefix-sum."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"cents": h.index.to_numpy(np.int64), "cnt": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: distinct cent values
        .groupby("cents")["cnt"]
        .sum()
        .sort_index()
    )
    cols = ["decile", "k_rank", "cum_cents", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    v = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    N = int(c.sum())
    T = int((v * c).sum())
    if T == 0:
        return empty
    cumc = np.cumsum(c)
    cumv = np.cumsum(v * c)
    rows = []
    for q in range(1, 11):
        k = (q * N + 9) // 10
        i = int(np.searchsorted(cumc, k))
        below_c = int(cumc[i - 1]) if i > 0 else 0
        below_v = int(cumv[i - 1]) if i > 0 else 0
        cum = below_v + (k - below_c) * int(v[i])
        share = float(cum) / float(T)
        rows.append(
            (
                np.int64(q), np.int64(k), np.int64(cum),
                np.int64(np.floor(share * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c_: np.int64 for c_ in cols}
    )


ORACLES263["orders_lorenz_curve"] = """
WITH b AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
h AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(cents * cnt) AS BIGINT) AS t FROM h),
cum AS (
  SELECT cents,
         CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cc,
         CAST(sum(cents * cnt) OVER (ORDER BY cents) AS BIGINT) AS cv,
         CAST(coalesce(sum(cnt) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below_c,
         CAST(coalesce(sum(cents * cnt) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below_v
  FROM h
),
q AS (SELECT CAST(r.range AS BIGINT) AS decile FROM range(1, 11) r),
pick AS (
  SELECT q.decile, (q.decile * tot.n + 9) // 10 AS k,
         min(cum.cents) AS cents
  FROM q, tot JOIN cum ON cum.cc >= (q.decile * tot.n + 9) // 10
  GROUP BY 1, 2
)
SELECT p.decile, p.k AS k_rank,
       CAST(c.below_v + (p.k - c.below_c) * p.cents AS BIGINT) AS cum_cents,
       CAST(floor(CAST(c.below_v + (p.k - c.below_c) * p.cents AS DOUBLE)
                  / CAST(tot.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro
FROM pick p JOIN cum c ON c.cents = p.cents, tot
WHERE tot.t <> 0
ORDER BY p.decile"""


# ---------------------------------------------------------------------------
# events_seasonal_decompose — classical additive weekly decomposition
# ---------------------------------------------------------------------------


def q_events_seasonal_decompose(sf_dir: str):
    """Classical additive decomposition of the zero-filled daily count
    series with a centered 7-day moving average: trend S_t = Σ_{t−3..t+3} y
    (defined where the full window exists), detrended numerator
    D_t = 7·y_t − S_t (EXACT integers), and the UNNORMALIZED seasonal index
    per epoch-weekday slot sidx = ΣD / (7·count) — one division of exact
    integers per slot. Per slot: slot, n_terms, d_sum, sidx_micro.

    Scale shape: one (day → count) combiner per batch; the bounded
    calendar grid scans on the driver (at 100 TB the window sum is a
    partitioned prefix-sum with 3-row boundary overlap)."""

    def partial(t: pa.Table) -> pa.Table:
        days = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(days).groupby(days).size()
        return pa.table(
            {
                "dy": pa.array(h.index.to_numpy(np.int64)),
                "cnt": pa.array(h.to_numpy(np.int64)),
            }
        )

    days = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dy")["cnt"]
        .sum()
    )
    cols = ["slot", "n_terms", "d_sum", "sidx_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    d0, d1 = int(days.index.min()), int(days.index.max())
    n = d1 - d0 + 1
    if n < 7:
        return empty
    y = np.zeros(n, np.int64)
    y[days.index.to_numpy(np.int64) - d0] = days.to_numpy(np.int64)
    csum = np.concatenate([[0], np.cumsum(y)])
    t_idx = np.arange(3, n - 3, dtype=np.int64)
    S = csum[t_idx + 4] - csum[t_idx - 3]
    D = 7 * y[t_idx] - S
    slot = (d0 + t_idx) % 7
    agg = pd.DataFrame({"slot": slot, "d": D}).groupby("slot")["d"].agg(
        ["sum", "size"]
    )
    out = pd.DataFrame(
        {
            "slot": agg.index.to_numpy(np.int64),
            "n_terms": agg["size"].to_numpy(np.int64),
            "d_sum": agg["sum"].to_numpy(np.int64),
        }
    )
    sidx = out["d_sum"].to_numpy(np.float64) / (
        7.0 * out["n_terms"].to_numpy(np.float64)
    )
    out["sidx_micro"] = np.floor(sidx * 1_000_000.0 + 0.5).astype(np.int64)
    return out.sort_values("slot").reset_index(drop=True)


ORACLES263["events_seasonal_decompose"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy, g.d0 AS d0, g.d1 AS d1
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y,
         grid.dy - grid.d0 AS t, grid.dy % 7 AS slot,
         grid.d1 - grid.d0 + 1 AS n
  FROM grid LEFT JOIN h USING (dy)
),
w AS (
  SELECT t, slot, n, y,
         CAST(sum(y) OVER (ORDER BY t
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s,
         CAST(count(*) OVER (ORDER BY t
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS wn
  FROM x
),
d AS (
  SELECT slot, 7 * y - s AS dv FROM w WHERE wn = 7
)
SELECT CAST(slot AS BIGINT) AS slot,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(dv) AS BIGINT) AS d_sum,
       CAST(floor(CAST(sum(dv) AS DOUBLE)
                  / (7.0 * CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS sidx_micro
FROM d GROUP BY slot
ORDER BY slot"""


QUERIES263 = {
    "orders_lorenz_curve": q_orders_lorenz_curve,
    "events_seasonal_decompose": q_events_seasonal_decompose,
}
