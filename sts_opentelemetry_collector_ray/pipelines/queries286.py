"""Driver-contract queries, wave 286 — the Damgaard-Weiner Lorenz
asymmetry coefficient of order values (exact rational mean-crossing
interpolation) and the BIC-approximated Bayes factor for a weekday
effect in event arrivals (multinomial vs uniform). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES286: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# orders_lorenz_asymmetry — Damgaard-Weiner LAC
# ---------------------------------------------------------------------------


def q_orders_lorenz_asymmetry(sf_dir: str):
    """Lorenz asymmetry coefficient of order totals (cents): with
    m = #{y < mu} (decided by the EXACT comparison y n < S), x_m the
    largest value below the mean, x_m1 the smallest at-or-above, and
    delta = (S - n x_m) / (n (x_m1 - x_m)),
    LAC = (m + delta)/n + (L_m + delta x_m1)/S. LAC > 1 means the
    inequality comes from a few large orders, < 1 from many small ones.
    One row: n, m_below, delta_micro, lac_micro.

    Scale shape: per-batch (cents -> count) combiner; only the bounded
    cents histogram reaches the driver (the `orders_lorenz_curve`
    idiom)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["n", "m_below", "delta_micro", "lac_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    y = hist.index.to_numpy(np.int64).astype(object)
    c = hist.to_numpy(np.int64).astype(object)
    n = int(c.sum())
    s = int((y * c).sum())
    if s <= 0 or n < 2:
        return empty
    below = np.array([int(v) * n < s for v in y], bool)
    if not below.any() or below.all():
        return empty
    m = int(c[below].sum())
    l_m = int((y[below] * c[below]).sum())
    x_m = int(max(int(v) for v, b in zip(y, below) if b))
    x_m1 = int(min(int(v) for v, b in zip(y, below) if not b))
    delta = (float(s) - float(n) * float(x_m)) / (
        float(n) * (float(x_m1) - float(x_m))
    )
    lac = (float(m) + delta) / float(n) + (
        float(l_m) + delta * float(x_m1)
    ) / float(s)
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(m),
                np.int64(np.floor(delta * 1_000_000.0 + 0.5)),
                np.int64(np.floor(lac * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES286["orders_lorenz_asymmetry"] = """
WITH b AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders
),
h AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(y * c) AS BIGINT) AS s
  FROM h
),
split AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN CAST(h.y AS HUGEINT) * m.n < m.s
                           THEN h.c END), 0) AS BIGINT) AS mb,
    CAST(coalesce(sum(CASE WHEN CAST(h.y AS HUGEINT) * m.n < m.s
                           THEN h.y * h.c END), 0) AS BIGINT) AS lm,
    max(CASE WHEN CAST(h.y AS HUGEINT) * m.n < m.s THEN h.y END) AS xm,
    min(CASE WHEN CAST(h.y AS HUGEINT) * m.n >= m.s THEN h.y END) AS xm1
  FROM h, m
  GROUP BY m.n, m.s
),
d AS (
  SELECT m.n, m.s, split.mb, split.lm, split.xm, split.xm1,
         (CAST(m.s AS DOUBLE) - CAST(m.n AS DOUBLE) * CAST(split.xm
            AS DOUBLE))
           / (CAST(m.n AS DOUBLE)
              * (CAST(split.xm1 AS DOUBLE) - CAST(split.xm AS DOUBLE)))
           AS delta
  FROM m, split
  WHERE split.xm IS NOT NULL AND split.xm1 IS NOT NULL
        AND m.s > 0 AND m.n >= 2
)
SELECT n, mb AS m_below,
       CAST(floor(delta * 1000000.0 + 0.5) AS BIGINT) AS delta_micro,
       CAST(floor(((CAST(mb AS DOUBLE) + delta) / CAST(n AS DOUBLE)
                   + (CAST(lm AS DOUBLE) + delta * CAST(xm1 AS DOUBLE))
                     / CAST(s AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS lac_micro
FROM d"""


# ---------------------------------------------------------------------------
# events_weekday_bayes_factor — BIC Bayes factor for a weekday effect
# ---------------------------------------------------------------------------


def q_events_weekday_bayes_factor(sf_dir: str):
    """Is there a weekday effect in event arrivals? Multinomial weekday
    model (6 free parameters, MLE = cell shares) vs uniform 1/7:
    ll_dow = sum c ln(c/N), ll_null = N ln(1/7),
    ln BF = (ll_dow - ll_null) - 3 ln N (the BIC/Schwarz approximation
    with 6 extra parameters). Counts are exact; only logs are float.
    One row: n, ll_null_milli, ll_dow_milli, ln_bf_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        dow = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        ) % 7
        h = pd.Series(dow).groupby(dow).size()
        return pd.DataFrame(
            {"dow": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dow")["c"]
        .sum()
    )
    cols = ["n", "ll_null_milli", "ll_dow_milli", "ln_bf_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    c = h.to_numpy(np.int64)
    n = int(c.sum())
    if n == 0 or (c == 0).any():
        return empty
    cf = c.astype(np.float64)
    ll_dow = float((cf * np.log(cf / float(n))).sum())
    ll_null = float(n) * float(np.log(1.0 / 7.0))
    ln_bf = (ll_dow - ll_null) - 3.0 * float(np.log(float(n)))
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(ll_null * 1_000.0 + 0.5)),
                np.int64(np.floor(ll_dow * 1_000.0 + 0.5)),
                np.int64(np.floor(ln_bf * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES286["events_weekday_bayes_factor"] = f"""
WITH h AS (
  SELECT (epoch_us(ts) // {_DAY_US}) % 7 AS dow,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(min(c) AS BIGINT) AS cmin
  FROM h
),
ll AS (
  SELECT sum(CAST(h.c AS DOUBLE)
             * ln(CAST(h.c AS DOUBLE) / CAST(m.n AS DOUBLE))) AS ll_dow
  FROM h, m GROUP BY m.n
),
one AS (SELECT m.n, ll.ll_dow, m.cmin FROM m, ll)
SELECT n,
       CAST(floor(CAST(n AS DOUBLE) * ln(1.0 / 7.0) * 1000.0 + 0.5)
            AS BIGINT) AS ll_null_milli,
       CAST(floor(ll_dow * 1000.0 + 0.5) AS BIGINT) AS ll_dow_milli,
       CAST(floor(((ll_dow - CAST(n AS DOUBLE) * ln(1.0 / 7.0))
                   - 3.0 * ln(CAST(n AS DOUBLE))) * 1000.0 + 0.5)
            AS BIGINT) AS ln_bf_milli
FROM one
WHERE n > 0 AND cmin > 0"""


QUERIES286 = {
    "orders_lorenz_asymmetry": q_orders_lorenz_asymmetry,
    "events_weekday_bayes_factor": q_events_weekday_bayes_factor,
}
