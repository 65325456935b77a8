"""Driver-contract queries, wave 319 — the hot-hand conditional test on
the daily series (does a high day follow runs of high days more often
than the base rate?) and activity synchrony among the top-10 users
(mean pairwise cosine of daily activity vectors). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES319: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_hot_hand — conditional persistence of high days
# ---------------------------------------------------------------------------


def q_events_hot_hand(sf_dir: str):
    """Hot-hand counting on the zero-filled daily series: a day is HIGH
    when strictly above the lower median; report the base high rate,
    P(high | previous high) and P(high | previous 2 high) — pure integer
    counting with exact-median comparisons, three divisions. One row:
    n_days, n_high, base_micro, cond1_micro, cond2_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )
    from sts_opentelemetry_collector_ray.pipelines.queries265 import (
        _lower_median,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "n_high", "base_micro", "cond1_micro", "cond2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 4:
        return empty
    med = _lower_median(y)
    h = (y > med).astype(np.int64)
    n_high = int(h.sum())
    base = float(n_high) / float(n)
    after1_n = int(h[:-1].sum())
    after1_x = int((h[:-1] & h[1:]).sum())
    run2 = h[:-2] & h[1:-1]
    after2_n = int(run2.sum())
    after2_x = int((run2 & h[2:]).sum())
    if after1_n == 0 or after2_n == 0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(n_high),
                np.int64(np.floor(base * 1_000_000.0 + 0.5)),
                np.int64(np.floor(
                    float(after1_x) / float(after1_n) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(after2_x) / float(after2_n) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES319["events_hot_hand"] = f"""
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
med AS (
  SELECT min(y) AS m FROM (
    SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM vc
  ), nn WHERE cum >= (nn.n + 1) // 2
),
hi AS (
  SELECT t, CAST(y > med.m AS BIGINT) AS h1 FROM x, med
),
seq AS (
  SELECT h1,
         lag(h1, 1) OVER (ORDER BY t) AS p1,
         lag(h1, 2) OVER (ORDER BY t) AS p2
  FROM hi
),
agg AS (
  SELECT
    CAST(sum(h1) AS BIGINT) AS n_high,
    CAST(sum(CASE WHEN p1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1n,
    CAST(sum(CASE WHEN p1 = 1 AND h1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS a1x,
    CAST(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS a2n,
    CAST(sum(CASE WHEN p1 = 1 AND p2 = 1 AND h1 = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS a2x
  FROM seq
)
SELECT nn.n AS n_days, agg.n_high,
       CAST(floor(CAST(agg.n_high AS DOUBLE) / nn.n * 1000000.0 + 0.5)
            AS BIGINT) AS base_micro,
       CAST(floor(CAST(agg.a1x AS DOUBLE) / agg.a1n * 1000000.0 + 0.5)
            AS BIGINT) AS cond1_micro,
       CAST(floor(CAST(agg.a2x AS DOUBLE) / agg.a2n * 1000000.0 + 0.5)
            AS BIGINT) AS cond2_micro
FROM nn, agg
WHERE nn.n >= 4 AND agg.a1n > 0 AND agg.a2n > 0"""


# ---------------------------------------------------------------------------
# users_activity_synchrony — pairwise cosine of top users' daily vectors
# ---------------------------------------------------------------------------


def q_users_activity_synchrony(sf_dir: str):
    """Synchrony of the 10 busiest users (count desc, id asc): each
    user's zero-filled daily count vector over the global grid, all 45
    pairwise cosines (dimension-sequential is unnecessary — the moments
    are EXACT integers), and their mean. One row: n_users, n_pairs,
    mean_cos_micro, min_cos_micro, max_cos_micro.

    Scale shape: pass 1 picks the bounded top set from per-user count
    partials; pass 2 folds the |top| x |days| matrix — both bounded."""

    def count_partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        return pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "c": g.to_numpy(np.int64)}
        )

    totals = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("u")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "u"], ascending=[False, True])
    )
    cols = [
        "n_users", "n_pairs", "mean_cos_micro", "min_cos_micro",
        "max_cos_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(totals) < 2:
        return empty
    top = totals["u"].tolist()[:10]
    top_set = set(int(u) for u in top)

    def daily_partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dy = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        keep = np.isin(u, list(top_set))
        df = pd.DataFrame({"u": u[keep], "dy": dy[keep]})
        g = df.groupby(["u", "dy"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(daily_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["u", "dy"])["c"]
        .sum()
    )
    if h.empty:
        return empty
    users = sorted(top_set)
    vecs = {}
    d0 = int(h.index.get_level_values(1).min())
    d1 = int(h.index.get_level_values(1).max())
    n_days = d1 - d0 + 1
    for u in users:
        v = np.zeros(n_days, np.int64)
        if u in h.index.get_level_values(0):
            sub = h.loc[u]
            v[sub.index.to_numpy(np.int64) - d0] = sub.to_numpy(np.int64)
        vecs[u] = v
    pairs = []
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            va, vb = vecs[a].astype(object), vecs[b].astype(object)
            dot = int((va * vb).sum())
            na = int((va * va).sum())
            nb = int((vb * vb).sum())
            if na == 0 or nb == 0:
                continue
            pairs.append(
                float(dot)
                / (float(np.sqrt(float(na))) * float(np.sqrt(float(nb))))
            )
    if not pairs:
        return empty
    arr = np.array(pairs, np.float64)
    return pd.DataFrame(
        [
            (
                np.int64(len(users)), np.int64(len(arr)),
                np.int64(np.floor(float(arr.mean()) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(arr.min()) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(arr.max()) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES319["users_activity_synchrony"] = f"""
WITH tc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c,
         row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
  FROM events GROUP BY 1
),
top AS (SELECT user_id FROM tc WHERE rk <= 10),
h AS (
  SELECT e.user_id AS u, epoch_us(e.ts) // {_DAY_US} AS dy,
         CAST(count(*) AS BIGINT) AS c
  FROM events e JOIN top ON top.user_id = e.user_id
  GROUP BY 1, 2
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
vec AS (
  SELECT t.user_id AS u, grid.dy, CAST(coalesce(h.c, 0) AS BIGINT) AS c
  FROM top t CROSS JOIN grid
  LEFT JOIN h ON h.u = t.user_id AND h.dy = grid.dy
),
norms AS (
  SELECT u, CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS n2
  FROM vec GROUP BY 1
),
dots AS (
  SELECT a.u AS ua, b.u AS ub,
         CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS dot
  FROM vec a JOIN vec b ON b.dy = a.dy AND a.u < b.u
  GROUP BY 1, 2
),
cosv AS (
  SELECT d.ua, d.ub,
         CAST(d.dot AS DOUBLE)
           / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
           AS v
  FROM dots d
  JOIN norms na ON na.u = d.ua JOIN norms nb ON nb.u = d.ub
  WHERE na.n2 > 0 AND nb.n2 > 0
)
SELECT CAST((SELECT count(*) FROM top) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(floor(avg(v) * 1000000.0 + 0.5) AS BIGINT) AS mean_cos_micro,
       CAST(floor(min(v) * 1000000.0 + 0.5) AS BIGINT) AS min_cos_micro,
       CAST(floor(max(v) * 1000000.0 + 0.5) AS BIGINT) AS max_cos_micro
FROM cosv
HAVING count(*) > 0"""


QUERIES319 = {
    "events_hot_hand": q_events_hot_hand,
    "users_activity_synchrony": q_users_activity_synchrony,
}
