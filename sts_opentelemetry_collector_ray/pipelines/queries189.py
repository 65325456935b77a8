"""Driver-contract queries, wave 189 — spectral entropy of the daily event
count series (DFT periodogram per type) and the Mann-Kendall trend test over
monthly order counts (exact integer S statistic with tie correction).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES189: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_spectral_entropy — periodogram entropy of the daily count series
# ---------------------------------------------------------------------------


def q_events_spectral_entropy(sf_dir: str):
    """Per event type over the mean-centered daily count series (calendar
    order, missing days absent — the observed sequence): periodogram
    P_k = (Σ x_t cos(2πkt/n))² + (Σ x_t sin(2πkt/n))² for k = 1..⌊n/2⌋,
    normalized spectral entropy H/ln(K) and the share of power in the low
    band k ≤ ⌊K/13⌋ (≳ fortnightly cycles), both in micro units.

    Scale shape: per-batch (type, day, n) combiner → driver folds the
    bounded |types|×|days| table and runs one vectorized outer-product DFT
    (K×n ≈ 180×365 per type) — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        g = (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_days", "entropy_micro", "lowfreq_share_micro"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_days": pd.Series([], dtype=np.int64),
            "entropy_micro": pd.Series([], dtype=np.int64),
            "lowfreq_share_micro": pd.Series([], dtype=np.int64),
        }
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
        n = len(x)
        kk = n // 2
        if kk < 2:
            continue
        xc = x - x.sum() / n
        t_idx = np.arange(n, dtype=np.float64)
        k_idx = np.arange(1, kk + 1, dtype=np.float64)
        ang = 2.0 * np.pi * np.outer(k_idx, t_idx) / n
        # row-wise dot products in t order — matches the SQL per-(k, t) sum
        c = np.cos(ang) @ xc
        s = np.sin(ang) @ xc
        p = c * c + s * s
        tot = p.sum()
        if tot <= 0.0:
            continue
        q = p / tot
        ent = float(-(q[q > 0.0] * np.log(q[q > 0.0])).sum() / np.log(kk))
        low = max(kk // 13, 1)
        share = float(p[:low].sum() / tot)
        rows.append(
            (
                et,
                np.int64(n),
                np.int64(np.floor(ent * 1_000_000.0 + 0.5)),
                np.int64(np.floor(share * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_days": np.int64, "entropy_micro": np.int64, "lowfreq_share_micro": np.int64}
    )


ORACLES189["events_spectral_entropy"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t,
         count(*) OVER (PARTITION BY event_type) AS nd,
         avg(n) OVER (PARTITION BY event_type) AS mu
  FROM daily
),
ks AS (
  SELECT DISTINCT event_type, nd,
         unnest(range(1, nd // 2 + 1)) AS k
  FROM idx WHERE nd // 2 >= 2
),
dft AS (
  SELECT ks.event_type, ks.nd, ks.k,
         sum((idx.n - idx.mu) * cos(2.0 * pi() * ks.k * idx.t / ks.nd)) AS c,
         sum((idx.n - idx.mu) * sin(2.0 * pi() * ks.k * idx.t / ks.nd)) AS s
  FROM ks JOIN idx ON ks.event_type = idx.event_type
  GROUP BY 1, 2, 3
),
p AS (
  SELECT event_type, nd, k, c * c + s * s AS p,
         sum(c * c + s * s) OVER (PARTITION BY event_type) AS tot,
         max(k) OVER (PARTITION BY event_type) AS kk,
         greatest(max(k) OVER (PARTITION BY event_type) // 13, 1) AS low
  FROM dft
),
e AS (
  SELECT event_type, any_value(nd) AS n_days,
         -sum(CASE WHEN p > 0.0 THEN p / tot * ln(p / tot) ELSE 0.0 END)
           / ln(any_value(kk)) AS ent,
         sum(CASE WHEN k <= low THEN p ELSE 0.0 END) / any_value(tot) AS share
  FROM p WHERE tot > 0.0 GROUP BY 1
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(floor(ent * 1000000.0 + 0.5) AS BIGINT) AS entropy_micro,
       CAST(floor(share * 1000000.0 + 0.5) AS BIGINT) AS lowfreq_share_micro
FROM e ORDER BY event_type"""


# ---------------------------------------------------------------------------
# orders_mann_kendall — non-parametric trend test over monthly order counts
# ---------------------------------------------------------------------------


def q_orders_mann_kendall(sf_dir: str):
    """Mann-Kendall trend test (Mann 1945, Kendall 1975) on the monthly
    order-count series: exact integer S = Σ_{i<j} sign(x_j − x_i), the tie
    correction numerator V = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (Var(S) = V/18)
    and the continuity-corrected Z in micro units.

    Scale shape: per-batch (ym, n) combiner → driver folds the bounded
    |months| table and evaluates the O(m²) sign matrix vectorized (m ≤ a few
    hundred) — no shuffle."""
    path = f"{sf_dir}/orders.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        s = pd.Series(t["o_orderdate"].to_numpy(zero_copy_only=False))
        ym = (s.dt.year * 100 + s.dt.month).to_numpy(np.int64)
        return (
            pd.DataFrame({"ym": ym, "n": 1})
            .groupby("ym", sort=False, as_index=False)
            .sum()
            .astype(np.int64)
        )

    part = (
        ray.data.read_parquet(path, columns=["o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_months", "s_stat", "var_num", "z_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    m = part.groupby("ym")["n"].sum().sort_index()
    x = m.to_numpy(np.int64)
    n = len(x)
    diff = x[None, :] - x[:, None]
    s_stat = int(np.sign(np.triu(diff, 1)).sum())
    _, tie_counts = np.unique(x, return_counts=True)
    ties = tie_counts[tie_counts > 1].astype(np.int64)
    v_num = int(n * (n - 1) * (2 * n + 5) - (ties * (ties - 1) * (2 * ties + 5)).sum())
    if v_num > 0 and s_stat != 0:
        z = (s_stat - (1 if s_stat > 0 else -1)) / np.sqrt(v_num / 18.0)
    else:
        z = 0.0
    return pd.DataFrame(
        {
            "n_months": np.array([n], np.int64),
            "s_stat": np.array([s_stat], np.int64),
            "var_num": np.array([v_num], np.int64),
            "z_micro": np.array(
                [np.floor(z * 1_000_000.0 + 0.5)], np.int64
            ),
        }
    )


ORACLES189["orders_mann_kendall"] = """
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM m a JOIN m b ON b.ym > a.ym
),
tg AS (SELECT x, count(*) AS t FROM m GROUP BY 1 HAVING count(*) > 1),
v AS (
  SELECT (SELECT count(*) FROM m) AS n,
         coalesce((SELECT sum(t * (t - 1) * (2 * t + 5)) FROM tg), 0) AS tie_sum
),
f AS (
  SELECT v.n, s.s_stat,
         v.n * (v.n - 1) * (2 * v.n + 5) - v.tie_sum AS v_num
  FROM v, s
)
SELECT CAST(n AS BIGINT) AS n_months,
       s_stat,
       CAST(v_num AS BIGINT) AS var_num,
       CAST(floor(CASE
         WHEN v_num > 0 AND s_stat > 0
           THEN (s_stat - 1) / sqrt(v_num / 18.0)
         WHEN v_num > 0 AND s_stat < 0
           THEN (s_stat + 1) / sqrt(v_num / 18.0)
         ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM f"""


QUERIES189 = {
    "events_spectral_entropy": q_events_spectral_entropy,
    "orders_mann_kendall": q_orders_mann_kendall,
}
