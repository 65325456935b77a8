"""Driver-contract queries, wave 376 — ordered funnel analysis
(signup -> click -> purchase by first-occurrence times per user) and
monthly DAU/MAU stickiness. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES376: dict[str, str] = {}

_DAY_US = 86_400_000_000
_FN_BUCKETS = 64
_FUNNEL = ("signup", "click", "purchase")


# ---------------------------------------------------------------------------
# events_funnel_ordered — ordered first-occurrence funnel
# ---------------------------------------------------------------------------


def q_events_funnel_ordered(sf_dir: str):
    """Funnel: per user the FIRST ts of each step; a user converts
    through step k iff first(step_1) < first(step_2) < ... <
    first(step_k) (strict event-time order, ties break the chain).
    Steps: signup -> click -> purchase. Per step: step_idx, step_name,
    n_users, conv_from_prev_micro, conv_from_first_micro.

    Scale shape: per-user (type -> min ts) fold inside ONE user-bucket
    exchange; each bucket emits 3 counters."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = np.isin(et, _FUNNEL)
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )[keep],
                "et": et[keep],
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy()[keep],
            }
        )
        if df.empty:
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=np.int64),
                    "et": pd.Series([], dtype=object),
                    "ts": pd.Series([], dtype=np.int64),
                    "_b": pd.Series([], dtype=np.int64),
                }
            )
        g = df.groupby(["u", "et"], as_index=False)["ts"].min()
        g["_b"] = (g["u"].to_numpy(np.int64) % _FN_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("s1", "s2", "s3")}
        )
        if len(g) == 0:
            return zero
        first = g.groupby(["u", "et"])["ts"].min().unstack()
        s1 = s2 = s3 = 0
        t1 = first[_FUNNEL[0]] if _FUNNEL[0] in first else None
        t2 = first[_FUNNEL[1]] if _FUNNEL[1] in first else None
        t3 = first[_FUNNEL[2]] if _FUNNEL[2] in first else None
        if t1 is not None:
            has1 = t1.notna()
            s1 = int(has1.sum())
            if t2 is not None:
                has2 = has1 & t2.notna() & (t1 < t2)
                s2 = int(has2.sum())
                if t3 is not None:
                    has3 = has2 & t3.notna() & (t2 < t3)
                    s3 = int(has3.sum())
        return pd.DataFrame(
            {"s1": [np.int64(s1)], "s2": [np.int64(s2)],
             "s3": [np.int64(s3)]}
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["step_idx", "step_name", "n_users", "conv_from_prev_micro",
            "conv_from_first_micro"]
    empty = pd.DataFrame(
        {
            "step_idx": pd.Series([], dtype=np.int64),
            "step_name": pd.Series([], dtype=object),
            "n_users": pd.Series([], dtype=np.int64),
            "conv_from_prev_micro": pd.Series([], dtype=np.int64),
            "conv_from_first_micro": pd.Series([], dtype=np.int64),
        }
    )
    counts = [int(p.get("s1", 0)), int(p.get("s2", 0)), int(p.get("s3", 0))]
    if counts[0] == 0:
        return empty
    rows = []
    for i, (name, n) in enumerate(zip(_FUNNEL, counts)):
        prev = counts[i - 1] if i > 0 else counts[0]
        rows.append(
            (
                np.int64(i + 1), name, np.int64(n),
                np.int64(np.floor(
                    float(n) / float(prev) * 1_000_000.0 + 0.5
                )) if prev > 0 else np.int64(0),
                np.int64(np.floor(
                    float(n) / float(counts[0]) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"step_idx": np.int64, "n_users": np.int64,
         "conv_from_prev_micro": np.int64,
         "conv_from_first_micro": np.int64}
    )


ORACLES376["events_funnel_ordered"] = """
WITH first AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           AS t1,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           AS t2,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t3
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY 1
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS s1,
    CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t1 < t2
                  THEN 1 ELSE 0 END) AS BIGINT) AS s2,
    CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t1 < t2
                   AND t3 IS NOT NULL AND t2 < t3
                  THEN 1 ELSE 0 END) AS BIGINT) AS s3
  FROM first
),
steps AS (
  SELECT 1 AS step_idx, 'signup' AS step_name, s1 AS n, s1 AS prev,
         s1 AS base FROM agg
  UNION ALL
  SELECT 2, 'click', s2, s1, s1 FROM agg
  UNION ALL
  SELECT 3, 'purchase', s3, s2, s1 FROM agg
)
SELECT CAST(step_idx AS BIGINT) AS step_idx, step_name,
       n AS n_users,
       CAST(CASE WHEN prev > 0
                 THEN floor(CAST(n AS DOUBLE) / prev * 1000000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS conv_from_prev_micro,
       CAST(floor(CAST(n AS DOUBLE) / base * 1000000.0 + 0.5)
            AS BIGINT) AS conv_from_first_micro
FROM steps
WHERE base > 0
ORDER BY step_idx"""


# ---------------------------------------------------------------------------
# users_dau_mau_stickiness — monthly DAU/MAU
# ---------------------------------------------------------------------------


def q_users_dau_mau_stickiness(sf_dir: str):
    """Stickiness: per epoch month (from epoch days, 30-day blocks are
    NOT used — calendar months via the date), mean DAU over the
    month's active days vs MAU. Per month: ym, n_active_days, mau,
    dau_sum, stickiness_micro (= dau_sum / (n_active_days * mau))."""

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        day = ts // _DAY_US
        dt = pd.to_datetime(ts, unit="us")
        ym = (dt.year * 100 + dt.month).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {"ym": ym, "d": day, "u": u}
        ).drop_duplicates()

    trip = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["ym", "n_active_days", "mau", "dau_sum", "stickiness_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if trip.empty:
        return empty
    dau = (
        trip.drop_duplicates(["ym", "d", "u"])
        .groupby(["ym", "d"])
        .size()
        .rename("dau")
        .reset_index()
    )
    mau = (
        trip.drop_duplicates(["ym", "u"]).groupby("ym").size().rename("mau")
    )
    rows = []
    for ym in sorted(mau.index):
        sub = dau[dau["ym"] == ym]
        nd = len(sub)
        ds = int(sub["dau"].sum())
        mv = int(mau[ym])
        if nd == 0 or mv == 0:
            continue
        rows.append(
            (
                np.int64(int(ym)), np.int64(nd), np.int64(mv),
                np.int64(ds),
                np.int64(np.floor(
                    float(ds) / (float(nd) * float(mv))
                    * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES376["users_dau_mau_stickiness"] = f"""
WITH base AS (
  SELECT DISTINCT
         CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym,
         epoch_us(ts) // {_DAY_US} AS d,
         user_id AS u
  FROM events
),
dau AS (
  SELECT ym, d, CAST(count(DISTINCT u) AS BIGINT) AS dau
  FROM base GROUP BY 1, 2
),
mau AS (
  SELECT ym, CAST(count(DISTINCT u) AS BIGINT) AS mau
  FROM base GROUP BY 1
),
agg AS (
  SELECT dau.ym, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(dau.dau) AS BIGINT) AS ds
  FROM dau GROUP BY 1
)
SELECT agg.ym, agg.nd AS n_active_days, mau.mau, agg.ds AS dau_sum,
       CAST(floor(CAST(agg.ds AS DOUBLE)
                  / (CAST(agg.nd AS DOUBLE) * mau.mau)
                  * 1000000.0 + 0.5) AS BIGINT) AS stickiness_micro
FROM agg JOIN mau USING (ym)
WHERE agg.nd > 0 AND mau.mau > 0
ORDER BY ym"""


QUERIES376 = {
    "events_funnel_ordered": q_events_funnel_ordered,
    "users_dau_mau_stickiness": q_users_dau_mau_stickiness,
}
