"""Driver-contract queries, wave 370 — day-over-day active-user
Jaccard retention curve and Tukey-fence outlier census per event type
(exact integer fences, no floats in the classification). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES370: dict[str, str] = {}

_DAY_US = 86_400_000_000
_UJ_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_user_day_jaccard — adjacent-day active-user overlap
# ---------------------------------------------------------------------------


def q_events_user_day_jaccard(sf_dir: str):
    """Audience churn velocity: per adjacent day pair (d, d+1) the
    Jaccard overlap of active-user sets. Intersections come from
    per-user active-day runs inside ONE user-bucket exchange; set
    sizes from a (day, distinct users) fold — all integers. Per day:
    day, n_today, n_next, n_inter, jaccard_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        df = pd.DataFrame({"u": u, "d": day}).drop_duplicates()
        df["_b"] = (df["u"].to_numpy(np.int64) % _UJ_BUCKETS).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "d": pd.Series([], dtype=np.int64),
                "inter": pd.Series([], dtype=np.int64),
                "size": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.drop_duplicates(["u", "d"]).sort_values(["u", "d"])
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        adj = (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)
        inter = pd.Series(d[:-1][adj]).groupby(d[:-1][adj]).size()
        size = pd.Series(d).groupby(d).size()
        out = pd.DataFrame(
            {
                "d": size.index.to_numpy(np.int64),
                "size": size.to_numpy(np.int64),
            }
        )
        out["inter"] = (
            out["d"].map(inter).fillna(0).astype(np.int64)
        )
        return out[["d", "inter", "size"]]

    per_day = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("d")[["inter", "size"]]
        .sum()
        .sort_index()
    )
    cols = ["day", "n_today", "n_next", "n_inter", "jaccard_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if per_day.empty:
        return empty
    days = per_day.index.to_numpy(np.int64)
    size = per_day["size"].to_numpy(np.int64)
    inter = per_day["inter"].to_numpy(np.int64)
    idx = {int(dd): i for i, dd in enumerate(days)}
    rows = []
    for i, dd in enumerate(days):
        j = idx.get(int(dd) + 1)
        if j is None:
            continue
        na, nb, iv = int(size[i]), int(size[j]), int(inter[i])
        union = na + nb - iv
        if union <= 0:
            continue
        rows.append(
            (
                np.int64(int(dd)), np.int64(na), np.int64(nb),
                np.int64(iv),
                np.int64(np.floor(
                    float(iv) / float(union) * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES370["events_user_day_jaccard"] = f"""
WITH du AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {_DAY_US} AS d
  FROM events
),
size AS (SELECT d, CAST(count(*) AS BIGINT) AS s FROM du GROUP BY 1),
inter AS (
  SELECT a.d, CAST(count(*) AS BIGINT) AS i
  FROM du a JOIN du b ON b.u = a.u AND b.d = a.d + 1
  GROUP BY 1
)
SELECT CAST(sa.d AS BIGINT) AS day, sa.s AS n_today, sb.s AS n_next,
       CAST(coalesce(inter.i, 0) AS BIGINT) AS n_inter,
       CAST(floor(CAST(coalesce(inter.i, 0) AS DOUBLE)
                  / (sa.s + sb.s - coalesce(inter.i, 0))
                  * 1000000.0 + 0.5) AS BIGINT) AS jaccard_micro
FROM size sa
JOIN size sb ON sb.d = sa.d + 1
LEFT JOIN inter ON inter.d = sa.d
WHERE sa.s + sb.s - coalesce(inter.i, 0) > 0
ORDER BY day"""


# ---------------------------------------------------------------------------
# events_tukey_fences_by_type — boxplot outlier census per type
# ---------------------------------------------------------------------------


def q_events_tukey_fences_by_type(sf_dir: str):
    """Boxplot outliers: per event type, exact quartiles off the
    value-cents histogram (Q1 at ceil(n/4), Q3 at ceil(3n/4)); a row
    is an outlier iff 2*v < 2*Q1 - 3*(Q3-Q1) or 2*v > 2*Q3 + 3*(Q3-Q1)
    — pure integer fences (the 1.5 IQR doubled). Per type: event_type,
    n, q1_cents, q3_cents, n_low_out, n_high_out, out_share_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"et": et, "y": cents})
            .groupby(["et", "y"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "y"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["event_type", "n", "q1_cents", "q3_cents", "n_low_out",
            "n_high_out", "out_share_micro"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if hist.empty:
        return empty
    rows = []
    for et in sorted(hist["et"].unique()):
        sub = hist[hist["et"] == et].sort_values("y")
        y = sub["y"].to_numpy(np.int64)
        c = sub["c"].to_numpy(np.int64)
        n = int(c.sum())
        if n < 4:
            continue
        cum = np.cumsum(c)
        q1 = int(y[int(np.searchsorted(cum, (n + 3) // 4, side="left"))])
        q3 = int(y[int(np.searchsorted(cum, (3 * n + 3) // 4,
                                       side="left"))])
        iqr = q3 - q1
        lo_f = 2 * q1 - 3 * iqr
        hi_f = 2 * q3 + 3 * iqr
        nlo = int(c[2 * y < lo_f].sum())
        nhi = int(c[2 * y > hi_f].sum())
        rows.append(
            (
                et, np.int64(n), np.int64(q1), np.int64(q3),
                np.int64(nlo), np.int64(nhi),
                np.int64(np.floor(
                    float(nlo + nhi) / float(n) * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES370["events_tukey_fences_by_type"] = """
WITH b AS (
  SELECT event_type AS et,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events
),
h AS (
  SELECT et, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
),
nn AS (SELECT et, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
cum AS (
  SELECT et, y, c, sum(c) OVER (PARTITION BY et ORDER BY y) AS cc
  FROM h
),
q1 AS (
  SELECT cum.et, min(cum.y) AS v
  FROM cum JOIN nn USING (et)
  WHERE cum.cc >= (nn.n + 3) // 4
  GROUP BY 1
),
q3 AS (
  SELECT cum.et, min(cum.y) AS v
  FROM cum JOIN nn USING (et)
  WHERE cum.cc >= (3 * nn.n + 3) // 4
  GROUP BY 1
),
cls AS (
  SELECT h.et, nn.n, q1.v AS q1v, q3.v AS q3v,
         CAST(sum(CASE WHEN 2 * h.y < 2 * q1.v - 3 * (q3.v - q1.v)
                       THEN h.c ELSE 0 END) AS BIGINT) AS nlo,
         CAST(sum(CASE WHEN 2 * h.y > 2 * q3.v + 3 * (q3.v - q1.v)
                       THEN h.c ELSE 0 END) AS BIGINT) AS nhi
  FROM h
  JOIN nn USING (et) JOIN q1 USING (et) JOIN q3 USING (et)
  WHERE nn.n >= 4
  GROUP BY 1, 2, 3, 4
)
SELECT et AS event_type, n, q1v AS q1_cents, q3v AS q3_cents,
       nlo AS n_low_out, nhi AS n_high_out,
       CAST(floor(CAST(nlo + nhi AS DOUBLE) / n * 1000000.0 + 0.5)
            AS BIGINT) AS out_share_micro
FROM cls
ORDER BY event_type"""


QUERIES370 = {
    "events_user_day_jaccard": q_events_user_day_jaccard,
    "events_tukey_fences_by_type": q_events_tukey_fences_by_type,
}
