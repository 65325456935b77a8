"""Driver-contract queries, wave 327 — day-of-month heaping of order
placement (payday/billing-cycle spikes over the uniform 28-day core)
and the exact Pareto point of user activity (the smallest share of
users holding 80% of events). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES327: dict[str, str] = {}

_PP_BUCKETS = 64


# ---------------------------------------------------------------------------
# orders_day_of_month_heaping — uniformity over the 28-day core
# ---------------------------------------------------------------------------


def q_orders_day_of_month_heaping(sf_dir: str):
    """Heaping test: orders placed on day-of-month 1..28 (the core every
    month shares) should be uniform at 1/28; the chi-square against
    that uniform and each day's share expose payday/billing heaping.
    Pure integer counting. Per day: dom, n, share_micro, chi2_micro
    (repeated)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        dom = df["o_orderdate"].dt.day.to_numpy(np.int64)
        keep = dom <= 28
        h = pd.Series(dom[keep]).groupby(dom[keep]).size()
        return pd.DataFrame(
            {"dom": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dom")["c"]
        .sum()
    )
    cols = ["dom", "n", "share_micro", "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    n = int(h.sum())
    if n == 0:
        return empty
    e = float(n) / 28.0
    chi2 = 0.0
    rows = []
    for d in range(1, 29):
        o = int(h.get(d, 0))
        chi2 += (float(o) - e) * (float(o) - e) / e
        rows.append((d, o))
    cm = np.int64(np.floor(chi2 * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        [
            (
                np.int64(d), np.int64(o),
                np.int64(np.floor(float(o) / float(n) * 1_000_000.0 + 0.5)),
                cm,
            )
            for d, o in rows
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES327["orders_day_of_month_heaping"] = """
WITH b AS (
  SELECT CAST(day(o_orderdate) AS BIGINT) AS dom FROM orders
  WHERE day(o_orderdate) <= 28
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
days AS (SELECT CAST(r.range AS BIGINT) + 1 AS dom FROM range(0, 28) r),
h AS (
  SELECT days.dom,
         CAST(coalesce(sum(CASE WHEN b.dom = days.dom THEN 1 END), 0)
              AS BIGINT) AS o
  FROM days LEFT JOIN b ON b.dom = days.dom
  GROUP BY 1
),
chi AS (
  SELECT sum((CAST(o AS DOUBLE) - CAST(nn.n AS DOUBLE) / 28.0)
             * (CAST(o AS DOUBLE) - CAST(nn.n AS DOUBLE) / 28.0)
             / (CAST(nn.n AS DOUBLE) / 28.0)) AS chi2
  FROM h, nn WHERE nn.n > 0
)
SELECT h.dom, h.o AS n,
       CAST(floor(CAST(h.o AS DOUBLE) / nn.n * 1000000.0 + 0.5) AS BIGINT)
         AS share_micro,
       CAST(floor(chi.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM h, nn, chi
WHERE nn.n > 0
ORDER BY h.dom"""


# ---------------------------------------------------------------------------
# users_pareto_point — smallest user share holding 80% of events
# ---------------------------------------------------------------------------


def q_users_pareto_point(sf_dir: str):
    """The exact Pareto point: order users by activity descending; the
    smallest k such that the top-k users hold >= 80% of events (decided
    by the EXACT comparison 5 cum >= 4 total over the activity
    histogram). One row: n_users, n_events, k_users, k_share_micro
    (k / n_users), events_covered.

    Scale shape: the bucketed activity-histogram reduce."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        out = pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "k": g.to_numpy(np.int64)}
        )
        out["_b"] = (out["u"] % _PP_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")["k"].sum()
        h = per.groupby(per.values).size()
        return pd.DataFrame(
            {"k": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("k")["c"]
        .sum()
        .sort_index(ascending=False)
    )
    cols = [
        "n_users", "n_events", "k_users", "k_share_micro", "events_covered",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    k = hist.index.to_numpy(np.int64).astype(object)
    c = hist.to_numpy(np.int64).astype(object)
    n_users = int(c.sum())
    n_events = int((k * c).sum())
    if n_events == 0:
        return empty
    cum_u = np.cumsum(c)
    cum_e = np.cumsum(k * c)
    i = next(
        i for i, ce in enumerate(cum_e) if 5 * int(ce) >= 4 * n_events
    )
    # within the boundary activity level, take just enough users
    below_u = int(cum_u[i - 1]) if i > 0 else 0
    below_e = int(cum_e[i - 1]) if i > 0 else 0
    lvl = int(k[i])
    need = 4 * n_events - 5 * below_e  # still needed, scaled by 5
    extra = (need + 5 * lvl - 1) // (5 * lvl)  # ceil(need / (5 lvl))
    k_users = below_u + int(extra)
    covered = below_e + int(extra) * lvl
    return pd.DataFrame(
        [
            (
                np.int64(n_users), np.int64(n_events), np.int64(k_users),
                np.int64(np.floor(
                    float(k_users) / float(n_users) * 1_000_000.0 + 0.5
                )),
                np.int64(covered),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES327["users_pareto_point"] = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1
),
h AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY 1),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nu, CAST(sum(k * c) AS BIGINT) AS ne
  FROM h
),
cum AS (
  SELECT k, c,
         sum(c) OVER (ORDER BY k DESC) AS cu,
         sum(k * c) OVER (ORDER BY k DESC) AS ce,
         coalesce(sum(c) OVER (ORDER BY k DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below_u,
         coalesce(sum(k * c) OVER (ORDER BY k DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below_e
  FROM h
),
pick AS (
  SELECT cum.k AS lvl, cum.below_u, cum.below_e
  FROM cum, tot
  WHERE 5 * cum.ce >= 4 * tot.ne
  ORDER BY cum.k DESC LIMIT 1
),
calc AS (
  SELECT tot.nu, tot.ne, pick.below_u, pick.below_e, pick.lvl,
         (4 * tot.ne - 5 * pick.below_e + 5 * pick.lvl - 1)
           // (5 * pick.lvl) AS extra
  FROM tot, pick
)
SELECT nu AS n_users, ne AS n_events,
       CAST(below_u + extra AS BIGINT) AS k_users,
       CAST(floor(CAST(below_u + extra AS DOUBLE) / nu * 1000000.0 + 0.5)
            AS BIGINT) AS k_share_micro,
       CAST(below_e + extra * lvl AS BIGINT) AS events_covered
FROM calc
WHERE ne > 0"""


QUERIES327 = {
    "orders_day_of_month_heaping": q_orders_day_of_month_heaping,
    "users_pareto_point": q_users_pareto_point,
}
