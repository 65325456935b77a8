"""Driver-contract queries, wave 392 — deterministic k-means (k = 2,
3 Lloyd iterations, most-active-user seeds) on hour-of-day activity
profiles of the top-60 users, and the order line-count profile with
mean order value per line count. Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES392: dict[str, str] = {}

_HOUR_US = 3_600_000_000
_KM_USERS = 60
_KM_ITERS = 3
_LC_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_hour_profile_kmeans — deterministic 2-means clustering
# ---------------------------------------------------------------------------


def q_users_hour_profile_kmeans(sf_dir: str):
    """K-means as a deterministic operator: the top-60 users by count
    (ties smaller id) each become a 24-dim hour-share profile;
    centroids seed from the two most active users and run 3 Lloyd
    iterations (squared-Euclidean assignment, ties -> cluster 0; all
    folds in dim / user order). One row: n_users, size_0, size_1,
    inertia_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hr = (
            pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        ) % 24
        g = (
            pd.DataFrame({"u": u, "h": hr})
            .groupby(["u", "h"])
            .size()
            .rename("c")
            .reset_index()
        )
        return g.astype(np.int64)

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["u", "h"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_users", "size_0", "size_1", "inertia_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cells.empty:
        return empty
    totals = cells.groupby("u")["c"].sum()
    order = sorted(totals.items(), key=lambda kv: (-int(kv[1]), int(kv[0])))
    top = [int(u) for u, _ in order[:_KM_USERS]]
    if len(top) < 3:
        return empty
    prof = {}
    for u in top:
        sub = cells[cells["u"] == u]
        tot = float(int(totals[u]))
        p = [0.0] * 24
        for _, r in sub.iterrows():
            p[int(r["h"])] = float(int(r["c"])) / tot
        prof[u] = p
    cent = [list(prof[top[0]]), list(prof[top[1]])]
    assign = {}
    for _ in range(_KM_ITERS):
        for u in top:  # assignment, user order
            d = []
            for c_ in cent:
                acc = 0.0
                for j in range(24):
                    diff = prof[u][j] - c_[j]
                    acc = acc + diff * diff
                d.append(acc)
            assign[u] = 0 if d[0] <= d[1] else 1
        for k_ in (0, 1):  # centroid update, user order folds
            members = [u for u in top if assign[u] == k_]
            if not members:
                continue
            for j in range(24):
                acc = 0.0
                for u in sorted(members):  # user-id order fold
                    acc = acc + prof[u][j]
                cent[k_][j] = acc / float(len(members))
    inertia = 0.0
    for u in sorted(top):  # user-id order fold
        c_ = cent[assign[u]]
        for j in range(24):
            diff = prof[u][j] - c_[j]
            inertia = inertia + diff * diff
    s0 = sum(1 for u in top if assign[u] == 0)
    return pd.DataFrame(
        [
            (
                np.int64(len(top)), np.int64(s0),
                np.int64(len(top) - s0),
                np.int64(np.floor(inertia * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _km_iter_sql(i: int) -> str:
    """One Lloyd iteration: assign from cent{i}, produce cent{i+1}."""
    return f"""
assign{i} AS (
  SELECT p.u,
         CASE WHEN
           (SELECT list_reduce(list_prepend(0.0,
              list((p2.share - c.v) * (p2.share - c.v) ORDER BY p2.h)),
              (a, b) -> a + b)
            FROM prof p2 JOIN cent{i} c
              ON c.k = 0 AND c.h = p2.h
            WHERE p2.u = p.u)
           <=
           (SELECT list_reduce(list_prepend(0.0,
              list((p2.share - c.v) * (p2.share - c.v) ORDER BY p2.h)),
              (a, b) -> a + b)
            FROM prof p2 JOIN cent{i} c
              ON c.k = 1 AND c.h = p2.h
            WHERE p2.u = p.u)
         THEN 0 ELSE 1 END AS k
  FROM (SELECT DISTINCT u FROM prof) p
),
cent{i + 1} AS (
  SELECT a.k, prof.h,
         list_reduce(list_prepend(0.0,
           list(prof.share ORDER BY prof.u)), (x, y) -> x + y)
           / count(*) AS v
  FROM prof JOIN assign{i} a USING (u)
  GROUP BY 1, 2
)"""


ORACLES392["users_hour_profile_kmeans"] = (
    f"""
WITH cells AS (
  SELECT user_id AS u,
         CAST((epoch_us(ts) // {_HOUR_US}) % 24 AS BIGINT) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
totals AS (
  SELECT u, CAST(sum(c) AS BIGINT) AS tot,
         row_number() OVER (ORDER BY sum(c) DESC, u) AS rk
  FROM cells GROUP BY 1
),
top AS (SELECT u, tot, rk FROM totals WHERE rk <= {_KM_USERS}),
hours AS (SELECT CAST(r.range AS BIGINT) AS h FROM range(0, 24) r),
prof AS (
  SELECT top.u, hours.h,
         CAST(coalesce(cells.c, 0) AS DOUBLE) / top.tot AS share
  FROM top CROSS JOIN hours
  LEFT JOIN cells ON cells.u = top.u AND cells.h = hours.h
),
cent0 AS (
  SELECT 0 AS k, prof.h, prof.share AS v
  FROM prof JOIN top ON top.u = prof.u AND top.rk = 1
  UNION ALL
  SELECT 1, prof.h, prof.share
  FROM prof JOIN top ON top.u = prof.u AND top.rk = 2
),
"""
    + ",\n".join(_km_iter_sql(i) for i in range(_KM_ITERS))
    + f""",
inertia AS (
  SELECT list_reduce(list_prepend(0.0,
           list(t ORDER BY u)), (x, y) -> x + y) AS v
  FROM (
    SELECT p.u,
           (SELECT list_reduce(list_prepend(0.0,
              list((p2.share - c.v) * (p2.share - c.v) ORDER BY p2.h)),
              (a, b) -> a + b)
            FROM prof p2
            JOIN cent{_KM_ITERS} c
              ON c.k = a.k AND c.h = p2.h
            WHERE p2.u = p.u) AS t
    FROM (SELECT DISTINCT u FROM prof) p
    JOIN assign{_KM_ITERS - 1} a USING (u)
  )
),
f AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM top) AS nu,
         (SELECT CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM assign{_KM_ITERS - 1}) AS s0,
         inertia.v AS inertia
  FROM inertia
)
SELECT nu AS n_users, s0 AS size_0,
       CAST(nu - s0 AS BIGINT) AS size_1,
       CAST(floor(inertia * 1000.0 + 0.5) AS BIGINT) AS inertia_milli
FROM f
WHERE nu >= 3"""
)


# ---------------------------------------------------------------------------
# orders_linecount_census — line count census with mean value
# ---------------------------------------------------------------------------


def q_orders_linecount_census(sf_dir: str):
    """Order shape: per line count (lineitems per order) the number of
    orders and the mean order total. Line counts come from ONE
    orderkey-bucket exchange merging both tables. Per row: n_lines,
    n_orders, mean_total_cents_milli."""

    def l_partial(t: pa.Table) -> pd.DataFrame:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(ok).groupby(ok).size()
        out = pd.DataFrame(
            {"ok": g.index.to_numpy(np.int64),
             "v": g.to_numpy(np.int64)}
        )
        out["_b"] = (out["ok"] % _LC_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(0)
        return out[["_b", "_src", "ok", "v"]]

    def o_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "ok": df["o_orderkey"].to_numpy(np.int64),
                "v": np.floor(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        out["_b"] = (out["ok"] % _LC_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(1)
        return out[["_b", "_src", "ok", "v"]]

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).map_batches(l_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(o_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "nl": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.int64),
            }
        )
        l = g[g["_src"] == 0].groupby("ok")["v"].sum()
        o = g[g["_src"] == 1]
        if l.empty or len(o) == 0:
            return zero
        o = o.assign(nl=o["ok"].map(l)).dropna(subset=["nl"])
        if o.empty:
            return zero
        out = (
            o.assign(nl=o["nl"].astype(np.int64))
            .groupby("nl")
            .agg(n=("ok", "size"), s=("v", "sum"))
            .reset_index()
        )
        return out.astype(np.int64)

    prof = (
        li.union(orders)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("nl")[["n", "s"]]
        .sum()
        .sort_index()
    )
    cols = ["n_lines", "n_orders", "mean_total_cents_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if prof.empty:
        return empty
    rows = []
    for nl, r in prof.iterrows():
        n, s = int(r["n"]), int(r["s"])
        rows.append(
            (
                np.int64(int(nl)), np.int64(n),
                np.int64(np.floor(float(s) / float(n) * 1_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES392["orders_linecount_census"] = """
WITH lc AS (
  SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS nl
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT lc.nl,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders o JOIN lc ON lc.ok = o.o_orderkey
),
agg AS (
  SELECT nl, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s
  FROM j GROUP BY 1
)
SELECT nl AS n_lines, n AS n_orders,
       CAST(floor(CAST(s AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT)
         AS mean_total_cents_milli
FROM agg
ORDER BY n_lines"""


QUERIES392 = {
    "users_hour_profile_kmeans": q_users_hour_profile_kmeans,
    "orders_linecount_census": q_orders_linecount_census,
}
