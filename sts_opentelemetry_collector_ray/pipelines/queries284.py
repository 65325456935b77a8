"""Driver-contract queries, wave 284 — the Robins-Alexander bipartite
clustering coefficient of the user x event-type graph (exact integer
square/path counting) and the empirical variogram of the daily event
series at standard lags (exact integer squared-difference sums). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES284: dict[str, str] = {}

_BC_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_bipartite_clustering — Robins-Alexander C4 coefficient
# ---------------------------------------------------------------------------


def q_events_bipartite_clustering(sf_dir: str):
    """Robins-Alexander bipartite clustering of the user-type incidence
    graph (edge iff the user emitted the type at least once):
    squares = sum over type pairs of C(common_users, 2), path-3 count
    L3 = sum over edges (deg_user - 1)(deg_type - 1), and
    CC = 4 squares / L3 — ALL integer counting, one division. One row:
    n_users, n_types, n_edges, n_squares, l3_paths, cc_micro.

    Scale shape: distinct (user, type) edges ride ONE user-bucket
    exchange; each bucket emits the bounded |types|^2 co-occurrence
    partial plus per-type degree partials — user identities never reach
    the driver."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df["_b"] = (df["u"] % _BC_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(["u", "et"])
        # per-user type sets -> pair co-occurrence + degree census
        deg_u = gg.groupby("u")["et"].nunique()
        rows = []
        # co-occurrence over bounded |types|^2 via self-merge per bucket
        m = gg.merge(gg, on="u")
        m = m[m["et_x"] < m["et_y"]]
        co = m.groupby(["et_x", "et_y"]).size().rename("c").reset_index()
        for _, r in co.iterrows():
            rows.append(("co", r["et_x"], r["et_y"], np.int64(r["c"])))
        td = gg.groupby("et").size()
        for et, c in td.items():
            rows.append(("deg", et, "", np.int64(c)))
        # sum over users of C(deg_u, 2)-style partials for L3:
        # edges with (deg_u - 1) weight per user-type edge
        w = gg.merge(deg_u.rename("du").reset_index(), on="u")
        per_type_w = (
            w.groupby("et")
            .agg(e=("du", "size"), s=("du", "sum"))
            .reset_index()
        )
        for _, r in per_type_w.iterrows():
            # sum over this type's edges of (deg_u - 1) = s - e
            rows.append(("l3w", r["et"], "", np.int64(int(r["s"]) - int(r["e"]))))
            rows.append(("edges", r["et"], "", np.int64(r["e"])))
        return pd.DataFrame(rows, columns=["kind", "a", "b", "c"])

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["kind", "a", "b"])["c"]
        .sum()
    )
    cols = [
        "n_users", "n_types", "n_edges", "n_squares", "l3_paths", "cc_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    co = parts.loc["co"] if "co" in parts.index.get_level_values(0) else None
    deg = parts.loc["deg"]
    l3w = parts.loc["l3w"]
    edges = parts.loc["edges"]
    n_types = len(deg)
    n_edges = int(edges.sum())
    # n_users: users = sum over users of 1 — recover from degree identity:
    # sum deg_t = n_edges = sum deg_u; count users via a tiny second fold
    n_users = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "u": pd.unique(
                        t["user_id"].to_numpy(zero_copy_only=False)
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["u"]
        .nunique()
    )
    squares = 0
    if co is not None:
        for c in co.to_numpy():
            c = int(c)
            squares += c * (c - 1) // 2
    # L3 = sum over edges (deg_u - 1)(deg_t - 1)
    #    = sum_t (deg_t - 1) * sum_{edges of t} (deg_u - 1)
    l3 = 0
    for et, s in l3w.items():
        dt = int(deg.loc[et])
        l3 += (dt - 1) * int(s)
    if l3 == 0:
        return empty
    cc = 4.0 * float(squares) / float(l3)
    return pd.DataFrame(
        [
            (
                np.int64(n_users), np.int64(n_types), np.int64(n_edges),
                np.int64(squares), np.int64(l3),
                np.int64(np.floor(cc * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES284["events_bipartite_clustering"] = """
WITH e AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
du AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
dt AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
co AS (
  SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS c
  FROM e a JOIN e b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
),
sq AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS s
       FROM co),
l3 AS (
  SELECT CAST(sum((du.d - 1) * (dt.d - 1)) AS BIGINT) AS p
  FROM e JOIN du ON du.u = e.u JOIN dt ON dt.t = e.t
),
nn AS (
  SELECT CAST((SELECT count(*) FROM du) AS BIGINT) AS n_users,
         CAST((SELECT count(*) FROM dt) AS BIGINT) AS n_types,
         CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges
)
SELECT nn.n_users, nn.n_types, nn.n_edges, sq.s AS n_squares,
       l3.p AS l3_paths,
       CAST(floor(4.0 * CAST(sq.s AS DOUBLE) / CAST(l3.p AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS cc_micro
FROM nn, sq, l3
WHERE l3.p > 0"""


# ---------------------------------------------------------------------------
# events_variogram — empirical semivariogram of the daily series
# ---------------------------------------------------------------------------


def q_events_variogram(sf_dir: str):
    """Empirical semivariogram of the zero-filled daily count series at
    lags {1, 2, 7, 14, 28}: gamma(h) = sum (y_{t+h} - y_t)^2 / (2 m_h)
    with EXACT integer squared-difference sums (the geostatistics view
    of temporal structure — a weekly-periodic series dips at h = 7, 14,
    28). Per lag: lag, m_pairs, d2_sum, gamma_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["lag", "m_pairs", "d2_sum", "gamma_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    rows = []
    for h in (1, 2, 7, 14, 28):
        if n <= h:
            continue
        d = y[h:] - y[:-h]
        m = n - h
        d2 = int((d.astype(object) * d.astype(object)).sum())
        gamma = float(d2) / (2.0 * float(m))
        rows.append(
            (
                np.int64(h), np.int64(m), np.int64(d2),
                np.int64(np.floor(gamma * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES284["events_variogram"] = f"""
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
lags AS (SELECT CAST(u.h AS BIGINT) AS lag
         FROM (SELECT unnest([1, 2, 7, 14, 28]) AS h) u),
pairs AS (
  SELECT lags.lag, (b.y - a.y) * (b.y - a.y) AS d2
  FROM lags JOIN x a ON true JOIN x b ON b.t = a.t + lags.lag
),
agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(d2) AS BIGINT) AS d2_sum
  FROM pairs GROUP BY 1
)
SELECT lag, m AS m_pairs, d2_sum,
       CAST(floor(CAST(d2_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS gamma_micro
FROM agg
ORDER BY lag"""


QUERIES284 = {
    "events_bipartite_clustering": q_events_bipartite_clustering,
    "events_variogram": q_events_variogram,
}
