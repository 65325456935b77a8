"""Driver-contract queries, wave 264 — permutation entropy (Bandt-Pompe
ordinal-pattern census, m=3) and the Allan variance at power-of-two
cluster sizes, both over the zero-filled daily event-count series. Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES264: dict[str, str] = {}

_DAY_US = 86_400_000_000


def _daily_counts(sf_dir: str) -> pd.Series:
    """Zero-fill-ready (day → count) map: one bounded combiner per batch;
    only the distinct-day histogram reaches the driver (the
    `events_seasonal_decompose` idiom — at 100 TB this stays a tiny
    |days|-sized partial exchange, rows never leave the workers)."""

    def partial(t: pa.Table) -> pa.Table:
        days = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(days).groupby(days).size()
        return pa.table(
            {
                "dy": pa.array(h.index.to_numpy(np.int64)),
                "cnt": pa.array(h.to_numpy(np.int64)),
            }
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dy")["cnt"]
        .sum()
    )


def _grid(days: pd.Series) -> np.ndarray:
    d0, d1 = int(days.index.min()), int(days.index.max())
    y = np.zeros(d1 - d0 + 1, np.int64)
    y[days.index.to_numpy(np.int64) - d0] = days.to_numpy(np.int64)
    return y


# ---------------------------------------------------------------------------
# events_permutation_entropy — Bandt-Pompe ordinal patterns, m=3
# ---------------------------------------------------------------------------


def q_events_permutation_entropy(sf_dir: str):
    """Ordinal-pattern census of consecutive daily-count triples
    (y_t, y_{t+1}, y_{t+2}): each triple maps to the argsort permutation
    under the strict total order (value, index) — ties resolve to the
    LATER index being larger (the Bandt-Pompe stable-rank convention) —
    so the three integer comparisons y1<y0, y2<y0, y2<y1 decide the
    pattern EXACTLY. Per pattern: perm, n, share_micro, plus the
    normalized permutation entropy H/ln(6) in pe_micro (same value on
    every row). Counting is pure integer work; the two divisions happen
    once at the end."""
    days = _daily_counts(sf_dir)
    cols = ["perm", "n", "share_micro", "pe_micro"]
    empty = pd.DataFrame(
        {
            "perm": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
            "pe_micro": pd.Series([], dtype=np.int64),
        }
    )
    if days.empty or (int(days.index.max()) - int(days.index.min()) + 1) < 3:
        return empty
    y = _grid(days)
    y0, y1, y2 = y[:-2], y[1:-1], y[2:]
    bits = 4 * (y1 < y0) + 2 * (y2 < y0) + (y2 < y1)
    code_to_perm = {0: "012", 1: "021", 4: "102", 6: "120", 3: "201", 7: "210"}
    h = pd.Series(bits).groupby(bits).size()
    n_tot = int(h.sum())
    perms = [code_to_perm[int(c)] for c in h.index]
    n = h.to_numpy(np.int64)
    p = n.astype(np.float64) / float(n_tot)
    pe = float(-(p * np.log(p)).sum() / np.log(6.0))
    out = pd.DataFrame(
        {
            "perm": perms,
            "n": n,
            "share_micro": np.floor(p * 1_000_000.0 + 0.5).astype(np.int64),
            "pe_micro": np.int64(np.floor(pe * 1_000_000.0 + 0.5)),
        }
    )
    return out.sort_values("perm").reset_index(drop=True)[cols]


ORACLES264["events_permutation_entropy"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
tri AS (
  SELECT y AS y0,
         lead(y, 1) OVER (ORDER BY dy) AS y1,
         lead(y, 2) OVER (ORDER BY dy) AS y2
  FROM x
),
pat AS (
  SELECT CASE 4 * CAST(y1 < y0 AS INT) + 2 * CAST(y2 < y0 AS INT)
              + CAST(y2 < y1 AS INT)
           WHEN 0 THEN '012' WHEN 1 THEN '021' WHEN 4 THEN '102'
           WHEN 6 THEN '120' WHEN 3 THEN '201' WHEN 7 THEN '210'
         END AS perm
  FROM tri WHERE y2 IS NOT NULL
),
c AS (SELECT perm, CAST(count(*) AS BIGINT) AS n FROM pat GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
ent AS (
  SELECT CAST(floor(
           sum(-(CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt))
             / ln(6.0) * 1000000.0 + 0.5) AS BIGINT) AS pe_micro
  FROM c, tot
)
SELECT c.perm, c.n,
       CAST(floor(CAST(c.n AS DOUBLE) / tot.nt * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro,
       ent.pe_micro
FROM c, tot, ent
ORDER BY c.perm"""


# ---------------------------------------------------------------------------
# events_allan_variance — non-overlapping AVAR at tau = 1,2,4,8,16 days
# ---------------------------------------------------------------------------


def q_events_allan_variance(sf_dir: str):
    """Allan variance of the daily count series at power-of-two cluster
    sizes: bin the zero-filled series into complete non-overlapping bins
    of tau days, take successive bin-SUM differences d_k (EXACT integers
    — the 1/tau average factors out as d^2/tau^2), and
    AVAR(tau) = sum(d^2) / (2 (M-1) tau^2). Per tau: tau, m_bins,
    d2_sum, avar_micro — one division at the end, everything else
    integer algebra (the oscillator-stability view of burstiness,
    complementing `events_fano_factor`/`events_hurst_rs`)."""
    days = _daily_counts(sf_dir)
    cols = ["tau", "m_bins", "d2_sum", "avar_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    rows = []
    for tau in (1, 2, 4, 8, 16):
        m = len(y) // tau
        if m < 2:
            continue
        s = y[: m * tau].reshape(m, tau).sum(axis=1)
        d = np.diff(s)
        d2 = int((d.astype(object) ** 2).sum())
        avar = float(d2) / (2.0 * float(m - 1) * float(tau) * float(tau))
        rows.append(
            (
                np.int64(tau), np.int64(m), np.int64(d2),
                np.int64(np.floor(avar * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols})


ORACLES264["events_allan_variance"] = f"""
WITH h AS (
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
),
taus AS (SELECT CAST(u.t AS BIGINT) AS tau
         FROM (SELECT unnest([1, 2, 4, 8, 16]) AS t) u),
bins AS (
  SELECT taus.tau, x.t // taus.tau AS k, CAST(sum(x.y) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS w
  FROM taus CROSS JOIN x
  GROUP BY 1, 2
),
full_bins AS (SELECT tau, k, s FROM bins WHERE w = tau),
d AS (
  SELECT tau, s - lag(s) OVER (PARTITION BY tau ORDER BY k) AS dv
  FROM full_bins
),
agg AS (
  SELECT tau, CAST(count(*) AS BIGINT) + 1 AS m_bins,
         CAST(sum(dv * dv) AS BIGINT) AS d2_sum
  FROM d WHERE dv IS NOT NULL
  GROUP BY tau
)
SELECT tau, m_bins, d2_sum,
       CAST(floor(CAST(d2_sum AS DOUBLE)
                  / (2.0 * CAST(m_bins - 1 AS DOUBLE)
                     * CAST(tau AS DOUBLE) * CAST(tau AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS avar_micro
FROM agg
WHERE m_bins >= 2
ORDER BY tau"""


QUERIES264 = {
    "events_permutation_entropy": q_events_permutation_entropy,
    "events_allan_variance": q_events_allan_variance,
}
