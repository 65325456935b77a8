"""Driver-contract queries, wave 386 — co-activity Jaccard pairs among
the top-20 most active users and the zero-traffic hour run census
(outage detector) over the hourly grid. Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES386: dict[str, str] = {}

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_TOP_USERS = 20


# ---------------------------------------------------------------------------
# users_top_coactivity_pairs — day-overlap among top users
# ---------------------------------------------------------------------------


def q_users_top_coactivity_pairs(sf_dir: str):
    """Do heavy users show up together? Among the top-20 users by
    event count (ties -> smaller id), every pair's active-day Jaccard;
    the top-10 pairs (jaccard desc, then user ids). Pure integers plus
    one micro division. Per pair: user_a, user_b, days_a, days_b,
    days_both, jaccard_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        df = pd.DataFrame({"u": u, "d": day})
        cnt = df.groupby("u").size().rename("c").reset_index()
        days = df.drop_duplicates()
        days["kind"] = np.int64(1)
        cnt["kind"] = np.int64(0)
        cnt = cnt.rename(columns={"c": "d"})
        out = pd.concat(
            [cnt[["kind", "u", "d"]], days[["kind", "u", "d"]]],
            ignore_index=True,
        )
        out["d"] = out["d"].astype(np.int64)
        return out

    folded = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["user_a", "user_b", "days_a", "days_b", "days_both",
            "jaccard_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if folded.empty:
        return empty
    counts = (
        folded[folded["kind"] == 0].groupby("u")["d"].sum().sort_index()
    )
    if counts.empty:
        return empty
    order = sorted(
        counts.items(), key=lambda kv: (-int(kv[1]), int(kv[0]))
    )[:_TOP_USERS]
    top = [int(u) for u, _ in order]
    day_sets = {
        int(u): set(
            int(x) for x in folded[
                (folded["kind"] == 1) & (folded["u"] == u)
            ]["d"].unique()
        )
        for u in top
    }
    recs = []
    for a, b in itertools.combinations(sorted(top), 2):
        da, db = day_sets[a], day_sets[b]
        union = len(da | db)
        if union == 0:
            continue
        inter = len(da & db)
        recs.append(
            (
                a, b, len(da), len(db), inter,
                int(np.floor(
                    float(inter) / float(union) * 1_000_000.0 + 0.5
                )),
            )
        )
    recs.sort(key=lambda r: (-r[5], r[0], r[1]))
    recs = recs[:10]
    if not recs:
        return empty
    return pd.DataFrame(recs, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES386["users_top_coactivity_pairs"] = f"""
WITH cnt AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
top AS (
  SELECT u, row_number() OVER (ORDER BY c DESC, u) AS rk
  FROM cnt QUALIFY rk <= {_TOP_USERS}
),
days AS (
  SELECT DISTINCT e.user_id AS u, epoch_us(e.ts) // {_DAY_US} AS d
  FROM events e JOIN top ON top.u = e.user_id
),
sz AS (SELECT u, CAST(count(*) AS BIGINT) AS nd FROM days GROUP BY 1),
pairs AS (
  SELECT a.u AS ua, b.u AS ub
  FROM top a JOIN top b ON a.u < b.u
),
inter AS (
  SELECT p.ua, p.ub, CAST(count(*) AS BIGINT) AS i
  FROM pairs p
  JOIN days da ON da.u = p.ua
  JOIN days db ON db.u = p.ub AND db.d = da.d
  GROUP BY 1, 2
),
j AS (
  SELECT p.ua, p.ub, sa.nd AS na, sb.nd AS nb,
         coalesce(inter.i, 0) AS i,
         CAST(floor(CAST(coalesce(inter.i, 0) AS DOUBLE)
                    / (sa.nd + sb.nd - coalesce(inter.i, 0))
                    * 1000000.0 + 0.5) AS BIGINT) AS jm
  FROM pairs p
  JOIN sz sa ON sa.u = p.ua
  JOIN sz sb ON sb.u = p.ub
  LEFT JOIN inter ON inter.ua = p.ua AND inter.ub = p.ub
  WHERE sa.nd + sb.nd - coalesce(inter.i, 0) > 0
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY jm DESC, ua, ub) AS rk FROM j
)
SELECT CAST(ua AS BIGINT) AS user_a, CAST(ub AS BIGINT) AS user_b,
       na AS days_a, nb AS days_b, CAST(i AS BIGINT) AS days_both,
       jm AS jaccard_micro
FROM ranked
WHERE rk <= 10
ORDER BY rk"""


# ---------------------------------------------------------------------------
# events_zero_hour_runs — outage run census
# ---------------------------------------------------------------------------


def q_events_zero_hour_runs(sf_dir: str):
    """Outage detector: on the zero-filled hourly grid, the runs of
    consecutive zero-count hours — how many, total dark hours, the
    longest run and where it starts (earliest tie). Pure integers.
    One row: n_hours, n_zero_hours, n_runs, longest_run,
    longest_run_start."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hr = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        h = pd.Series(hr).groupby(hr).size()
        return pd.DataFrame(
            {"hr": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hours = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")["c"]
        .sum()
    )
    cols = ["n_hours", "n_zero_hours", "n_runs", "longest_run",
            "longest_run_start"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hours.empty:
        return empty
    h0, h1 = int(hours.index.min()), int(hours.index.max())
    n = h1 - h0 + 1
    y = np.zeros(n, np.int64)
    y[hours.index.to_numpy(np.int64) - h0] = hours.to_numpy(np.int64)
    zero = y == 0
    n_zero = int(zero.sum())
    if n_zero == 0:
        return pd.DataFrame(
            [(np.int64(n), np.int64(0), np.int64(0), np.int64(0),
              np.int64(-1))],
            columns=cols,
        ).astype({c: np.int64 for c in cols})
    starts = zero & np.concatenate([[True], ~zero[:-1]])
    n_runs = int(starts.sum())
    best_len = 0
    best_start = -1
    cur = 0
    cur_start = -1
    for i in range(n):
        if zero[i]:
            if cur == 0:
                cur_start = i
            cur += 1
            if cur > best_len:
                best_len = cur
                best_start = cur_start
        else:
            cur = 0
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(n_zero), np.int64(n_runs),
                np.int64(best_len), np.int64(best_start),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES386["events_zero_hour_runs"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  SELECT CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 500000) r
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.hr = (SELECT h0 FROM g) + grid.t
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
marked AS (
  SELECT t, y,
         CASE WHEN y = 0 AND coalesce(lag(y) OVER (ORDER BY t), 1) <> 0
              THEN 1 ELSE 0 END AS is_start
  FROM x
),
runs AS (
  SELECT t, sum(is_start) OVER (ORDER BY t) AS run_id
  FROM marked WHERE y = 0
),
per_run AS (
  SELECT run_id, CAST(count(*) AS BIGINT) AS len,
         CAST(min(t) AS BIGINT) AS start
  FROM runs GROUP BY 1
),
best AS (
  SELECT len, start,
         row_number() OVER (ORDER BY len DESC, start) AS rk
  FROM per_run
),
agg AS (
  SELECT (SELECT CAST(coalesce(sum(len), 0) AS BIGINT) FROM per_run)
           AS nz,
         (SELECT CAST(count(*) AS BIGINT) FROM per_run) AS nr,
         (SELECT len FROM best WHERE rk = 1) AS bl,
         (SELECT start FROM best WHERE rk = 1) AS bs
)
SELECT nn.n AS n_hours, agg.nz AS n_zero_hours, agg.nr AS n_runs,
       CAST(coalesce(agg.bl, 0) AS BIGINT) AS longest_run,
       CAST(coalesce(agg.bs, -1) AS BIGINT) AS longest_run_start
FROM nn, agg"""


QUERIES386 = {
    "users_top_coactivity_pairs": q_users_top_coactivity_pairs,
    "events_zero_hour_runs": q_events_zero_hour_runs,
}
