"""Driver-contract queries, wave 266 — the newsvendor critical-fractile
stocking rule over daily order demand (exact integer inverse-CDF and
over/underage costs) and Bartels' rank test of serial randomness (the
rank analog of the von Neumann ratio, exact doubled-rank integers).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sts_opentelemetry_collector_ray.pipelines.queries264 import _grid

ORACLES266: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# orders_newsvendor — critical-fractile stocking over daily order counts
# ---------------------------------------------------------------------------

_RATIOS = ((9, 1), (3, 1), (1, 1), (1, 3))


def q_orders_newsvendor(sf_dir: str):
    """Newsvendor stocking per cost ratio: demand D = zero-filled daily
    order count; for underage/overage costs (cu, co) the optimal
    Q* = inf{q : F(q) >= cu/(cu+co)} — decided by the EXACT integer
    comparison cum_count*(cu+co) >= n_days*cu, no float fractile.
    under_sum = sum over days of (D-Q*)+, over_sum = (Q*-D)+, and
    cost_micro = (cu*under + co*over)/n_days in micro (the one
    division). Per ratio: cu, co, q_star, under_sum, over_sum,
    cost_micro.

    Scale shape: per-batch (day -> count) combiner; only the bounded
    day histogram reaches the driver (calendar-bounded at any corpus
    size)."""

    def partial(t: pa.Table) -> pa.Table:
        days = (
            pa.compute.cast(t["o_orderdate"], pa.int64()).to_numpy() // _DAY_US
        )
        h = pd.Series(days).groupby(days).size()
        return pa.table(
            {
                "dy": pa.array(h.index.to_numpy(np.int64)),
                "cnt": pa.array(h.to_numpy(np.int64)),
            }
        )

    days = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dy")["cnt"]
        .sum()
    )
    cols = ["cu", "co", "q_star", "under_sum", "over_sum", "cost_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    vals, cnts = np.unique(y, return_counts=True)
    cum = np.cumsum(cnts)
    rows = []
    for cu, co in _RATIOS:
        # smallest demand value whose cumulative count clears the fractile
        i = int(np.searchsorted(cum * (cu + co), n * cu, side="left"))
        q = int(vals[i])
        under = int(((vals[vals > q] - q) * cnts[vals > q]).sum())
        over = int(((q - vals[vals < q]) * cnts[vals < q]).sum())
        cost = float(cu * under + co * over) / float(n)
        rows.append(
            (
                np.int64(cu), np.int64(co), np.int64(q),
                np.int64(under), np.int64(over),
                np.int64(np.floor(cost * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols})


ORACLES266["orders_newsvendor"] = f"""
WITH h AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS dy,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
cdf AS (SELECT y, c, sum(c) OVER (ORDER BY y) AS cum FROM vc),
ratios AS (
  SELECT CAST(u.r[1] AS BIGINT) AS cu, CAST(u.r[2] AS BIGINT) AS co
  FROM (SELECT unnest([[9, 1], [3, 1], [1, 1], [1, 3]]) AS r) u
),
qstar AS (
  SELECT r.cu, r.co, min(cdf.y) AS q
  FROM ratios r, nn JOIN cdf ON cdf.cum * (r.cu + r.co) >= nn.n * r.cu
  GROUP BY 1, 2
),
costs AS (
  SELECT q.cu, q.co, q.q,
         CAST(coalesce(sum(CASE WHEN vc.y > q.q
                                THEN (vc.y - q.q) * vc.c END), 0)
              AS BIGINT) AS under_sum,
         CAST(coalesce(sum(CASE WHEN vc.y < q.q
                                THEN (q.q - vc.y) * vc.c END), 0)
              AS BIGINT) AS over_sum
  FROM qstar q CROSS JOIN vc
  GROUP BY 1, 2, 3
)
SELECT cu, co, q AS q_star, under_sum, over_sum,
       CAST(floor(CAST(cu * under_sum + co * over_sum AS DOUBLE)
                  / CAST(nn.n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS cost_micro
FROM costs, nn
ORDER BY cu DESC, co"""


# ---------------------------------------------------------------------------
# events_bartels_rank — rank von Neumann ratio test
# ---------------------------------------------------------------------------


def q_events_bartels_rank(sf_dir: str):
    """Bartels' rank test on the daily count series: average ranks
    (doubled to stay integer: R_t = 2*cum_below(y_t) + ties(y_t) + 1),
    RVN = sum (R_t - R_{t+1})^2 / sum (R_t - (n+1))^2 — the doubled-rank
    mean is EXACTLY n+1, so numerator and denominator are exact integers
    and the 4s cancel. Under H0 E[RVN] = 2,
    Var = 4(n-2)(5n^2-2n-9)/(5n(n+1)(n-1)^2). One row: n_days, num_q,
    den_q, rvn_micro, z_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "num_q", "den_q", "rvn_micro", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 3:
        return empty
    vals, cnts = np.unique(y, return_counts=True)
    cum_below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    r2_of_val = 2 * cum_below + cnts + 1  # doubled average rank per value
    r2 = r2_of_val[np.searchsorted(vals, y)]
    num = int((np.diff(r2).astype(object) ** 2).sum())
    den = int(((r2.astype(object) - (n + 1)) ** 2).sum())
    if den == 0:
        return empty
    rvn = float(num) / float(den)
    var = (
        4.0 * float(n - 2) * (5.0 * float(n) * float(n) - 2.0 * float(n) - 9.0)
    ) / (5.0 * float(n) * float(n + 1) * float(n - 1) * float(n - 1))
    z = (rvn - 2.0) / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(num), np.int64(den),
                np.int64(np.floor(rvn * 1_000_000.0 + 0.5)),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES266["events_bartels_rank"] = f"""
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
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
vc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
rk AS (
  SELECT y,
         2 * (sum(c) OVER (ORDER BY y) - c) + c + 1 AS r2
  FROM vc
),
seq AS (
  SELECT x.t, rk.r2 FROM x JOIN rk USING (y)
),
num AS (
  SELECT CAST(sum(d * d) AS BIGINT) AS num_q FROM (
    SELECT r2 - lead(r2) OVER (ORDER BY t) AS d FROM seq
  ) WHERE d IS NOT NULL
),
den AS (
  SELECT CAST(sum((seq.r2 - (nn.n + 1)) * (seq.r2 - (nn.n + 1))) AS BIGINT)
           AS den_q
  FROM seq, nn
)
SELECT nn.n AS n_days, num.num_q, den.den_q,
       CAST(floor(CAST(num.num_q AS DOUBLE) / CAST(den.den_q AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rvn_micro,
       CAST(floor((CAST(num.num_q AS DOUBLE) / CAST(den.den_q AS DOUBLE)
                   - 2.0)
                  / sqrt((4.0 * CAST(nn.n - 2 AS DOUBLE)
                          * (5.0 * CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                             - 2.0 * CAST(nn.n AS DOUBLE) - 9.0))
                         / (5.0 * CAST(nn.n AS DOUBLE)
                            * CAST(nn.n + 1 AS DOUBLE)
                            * CAST(nn.n - 1 AS DOUBLE)
                            * CAST(nn.n - 1 AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM nn, num, den
WHERE nn.n >= 3 AND den.den_q > 0"""


QUERIES266 = {
    "orders_newsvendor": q_orders_newsvendor,
    "events_bartels_rank": q_events_bartels_rank,
}
