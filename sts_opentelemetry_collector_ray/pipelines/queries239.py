"""Driver-contract queries, wave 239 — Kruskal-Wallis H test of event value
across event types (rank ANOVA with the exact tie correction; Kruskal &
Wallis 1952) and the Durbin-Watson first-order serial-correlation statistic
of the mean-centered daily count series per type (Durbin & Watson 1950).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES239: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_kruskal_wallis — rank ANOVA of value across types
# ---------------------------------------------------------------------------


def q_events_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis across event types over `value`: average ranks with
    ties, H = 12/(N(N+1))·Σ R_c²/n_c − 3(N+1), tie-corrected
    H' = H / (1 − Σ(t³−t)/(N³−N)). One row: n, k, h_micro, h_tie_micro.

    Scale shape: per-batch (value, type) count partials fold to a
    distinct-value table (6.6k distincts per 10k rows here; at 100 TB the
    same contract runs over the mergeable quantile sketch's bins) — ranks
    come from one cumulative scan over the sorted distincts."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "value"]).to_pandas()
        return (
            df.groupby(["value", "event_type"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "k", "h_micro", "h_tie_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    vt = part.groupby(["value", "event_type"], as_index=False)["c"].sum()
    v = vt.groupby("value")["c"].sum().sort_index()
    tie = v.to_numpy(np.float64)
    n = float(tie.sum())
    if n < 2:
        return empty
    # average rank per distinct value: (start + end) / 2 over 1..N
    hi = np.cumsum(tie)
    avg_rank = hi - (tie - 1.0) / 2.0
    ranks = pd.Series(avg_rank, index=v.index)
    vt["rsum"] = ranks.reindex(vt["value"]).to_numpy(np.float64) * vt[
        "c"
    ].to_numpy(np.float64)
    g = vt.groupby("event_type").agg(nc=("c", "sum"), r=("rsum", "sum"))
    k = len(g)
    if k < 2:
        return empty
    h = 12.0 / (n * (n + 1.0)) * float(
        (g["r"].to_numpy(np.float64) ** 2 / g["nc"].to_numpy(np.float64)).sum()
    ) - 3.0 * (n + 1.0)
    corr = 1.0 - float((tie ** 3 - tie).sum()) / (n ** 3 - n)
    micro = lambda x: np.int64(np.floor(x * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {"n": [np.int64(n)], "k": [np.int64(k)],
         "h_micro": [micro(h)], "h_tie_micro": [micro(h / corr)]}
    )


ORACLES239["events_kruskal_wallis"] = """
WITH vt AS (
  SELECT value AS v, event_type, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
dv AS (SELECT v, sum(c) AS t FROM vt GROUP BY 1),
rk AS (
  SELECT v, t,
         sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (t - 1.0) / 2.0 AS avg_rank
  FROM dv
),
tot AS (SELECT sum(t) AS n, sum(t * t * t - t) AS ties FROM dv),
gr AS (
  SELECT vt.event_type, sum(vt.c) AS nc, sum(vt.c * rk.avg_rank) AS r
  FROM vt JOIN rk ON vt.v = rk.v GROUP BY 1
),
h AS (
  SELECT tot.n, CAST(count(*) AS BIGINT) AS k,
         12.0 / (tot.n * (tot.n + 1.0)) * sum(gr.r * gr.r / gr.nc)
           - 3.0 * (tot.n + 1.0) AS h,
         1.0 - tot.ties / (tot.n * tot.n * tot.n - tot.n) AS corr
  FROM gr, tot GROUP BY tot.n, tot.ties
)
SELECT CAST(n AS BIGINT) AS n, k,
       CAST(floor(h * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
       CAST(floor(h / corr * 1000000.0 + 0.5) AS BIGINT) AS h_tie_micro
FROM h WHERE k >= 2 AND n >= 2"""


# ---------------------------------------------------------------------------
# events_durbin_watson — DW statistic of the centered daily series
# ---------------------------------------------------------------------------


def q_events_durbin_watson(sf_dir: str):
    """Per event type: the Durbin-Watson statistic of the mean-centered
    daily count series — DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t² (≈2 no
    serial correlation, →0 positive, →4 negative; types with < 3 days or
    zero variance drop). Output: event_type, n_days, dw_micro.

    Scale shape: bounded daily fold; the scan is one vectorized diff on
    the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_days", "dw_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        if len(y) < 3:
            continue
        e = y - y.sum() / len(y)
        den = float((e * e).sum())
        if den <= 0.0:
            continue
        dw = float((np.diff(e) ** 2).sum()) / den
        rows.append(
            (et, np.int64(len(y)),
             np.int64(np.floor(dw * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES239["events_durbin_watson"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
mu AS (
  SELECT event_type, avg(y) AS m, count(*) AS n
  FROM daily GROUP BY 1 HAVING count(*) >= 3
),
e AS (
  SELECT d.event_type, d.day, d.y - mu.m AS e, mu.n
  FROM daily d JOIN mu ON d.event_type = mu.event_type
),
lagd AS (
  SELECT event_type, n, e,
         lag(e) OVER (PARTITION BY event_type ORDER BY day) AS pe
  FROM e
),
agg AS (
  SELECT event_type, any_value(n) AS n,
         sum(CASE WHEN pe IS NOT NULL THEN (e - pe) * (e - pe) ELSE 0 END)
           AS num,
         sum(e * e) AS den
  FROM lagd GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(num / den * 1000000.0 + 0.5) AS BIGINT) AS dw_micro
FROM agg WHERE den > 0.0 ORDER BY event_type"""


QUERIES239 = {
    "events_kruskal_wallis": q_events_kruskal_wallis,
    "events_durbin_watson": q_events_durbin_watson,
}
