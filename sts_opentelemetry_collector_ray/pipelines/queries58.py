"""Driver-contract queries, wave 58 — time-to-convert funnel latency
(signup → first purchase, the activation metric growth teams watch) and ABC
Pareto classification of part revenue (the inventory-prioritization split).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES58: dict[str, str] = {}

_TTC_BUCKETS = 64
_SENTINEL = np.iinfo(np.int64).max


# ---------------------------------------------------------------------------
# events_time_to_convert — signup→purchase latency distribution
# ---------------------------------------------------------------------------


def q_events_time_to_convert(sf_dir: str):
    """Activation latency: per user, seconds from FIRST signup to FIRST
    purchase (converted ⟺ both exist and the purchase is not earlier);
    report the converted count, lower-median, lower-p90 and max — all
    integer picks from an exact histogram, no float math anywhere.

    Scale shape: per-batch (user → min signup ts, min purchase ts) partials
    → ONE user-bucket exchange for the exact per-user re-reduce → per-bucket
    (delta-seconds → count) histogram partials — the driver merges only the
    bounded delta-domain histogram, never per-user rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy(np.int64)
        s = np.where(et == "signup", ts_us, _SENTINEL)
        p = np.where(et == "purchase", ts_us, _SENTINEL)
        g = (
            pd.DataFrame({"user_id": uid, "s": s, "p": p})
            .groupby("user_id", sort=False)
            .agg(s=("s", "min"), p=("p", "min"))
            .reset_index()
        )
        g["_b"] = (g["user_id"].to_numpy(np.int64) % _TTC_BUCKETS).astype(np.int64)
        return g

    def merge_hist(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby("user_id", sort=False)
            .agg(s=("s", "min"), p=("p", "min"))
            .reset_index()
        )
        s = m["s"].to_numpy(np.int64)
        p = m["p"].to_numpy(np.int64)
        conv = (s != _SENTINEL) & (p != _SENTINEL) & (p >= s)
        ds = (p[conv] - s[conv]) // 1_000_000
        h = pd.Series(ds).groupby(ds).size()
        return pd.DataFrame(
            {
                "ds": h.index.to_numpy(np.int64),
                "cnt": h.to_numpy(np.int64),
            }
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge_hist, batch_format="pandas")
        .to_pandas()  # bounded: delta-seconds domain
        .groupby("ds")["cnt"]
        .sum()
        .sort_index()
    )
    n = int(hist.sum())
    if n:
        vals = hist.index.to_numpy(np.int64)
        cum = hist.to_numpy(np.int64).cumsum()
        p50 = int(vals[int(np.argmax(cum >= (n + 1) // 2))])
        p90 = int(vals[int(np.argmax(cum >= (9 * n + 9) // 10))])
        mx = int(vals[-1])
    else:
        p50 = p90 = mx = 0
    return pd.DataFrame(
        {
            "n_converted": [np.int64(n)],
            "p50_s": [np.int64(p50)],
            "p90_s": [np.int64(p90)],
            "max_s": [np.int64(mx)],
        }
    )


ORACLES58["events_time_to_convert"] = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
  FROM events GROUP BY 1
),
d AS (
  SELECT (epoch_us(p_ts) - epoch_us(s_ts)) // 1000000 AS ds
  FROM f WHERE s_ts IS NOT NULL AND p_ts IS NOT NULL AND p_ts >= s_ts
),
r AS (SELECT ds, row_number() OVER (ORDER BY ds) AS rn, count(*) OVER () AS n
      FROM d)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_converted,
       CAST(coalesce((SELECT ds FROM r WHERE rn = (n + 1) // 2), 0) AS BIGINT)
         AS p50_s,
       CAST(coalesce((SELECT ds FROM r WHERE rn = (9 * n + 9) // 10), 0)
            AS BIGINT) AS p90_s,
       CAST(coalesce((SELECT max(ds) FROM d), 0) AS BIGINT) AS max_s"""


# ---------------------------------------------------------------------------
# orders_abc_classes — Pareto ABC split of part revenue
# ---------------------------------------------------------------------------


def q_orders_abc_classes(sf_dir: str):
    """ABC inventory classification over lineitem revenue by part: parts in
    (revenue DESC, partkey ASC) order; class A while the running revenue
    share (INCLUDING the part) is ≤ 80% of total, B while ≤ 95%, else C —
    pure integer comparisons (cum·100 vs total·80/95), so ties and
    boundaries are exact.

    Scale shape: per-batch (part → revenue-micro) partials → ONE part-bucket
    exchange for the exact re-reduce → the bounded per-part table (parts are
    the dimension side) sorts once on the driver for the cumulative split;
    output is the 3-row class summary."""
    import ray  # noqa: F401

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = cents * (100 - dpct) * 100
        df = pd.DataFrame({"pk": t["l_partkey"].to_numpy(), "rev": rev})
        g = df.groupby("pk", sort=False)["rev"].sum().reset_index()
        g["rev"] = g["rev"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    per_part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: dimension-side part table
        .groupby("pk")["rev"]
        .sum()
        .reset_index()
        .sort_values(["rev", "pk"], ascending=[False, True], kind="mergesort")
    )
    rev = per_part["rev"].to_numpy(np.int64)
    total = int(rev.sum())
    cum = np.cumsum([int(v) for v in rev])  # python ints: no overflow
    cls = np.where(
        np.array([c * 100 <= total * 80 for c in cum]),
        "A",
        np.where(np.array([c * 100 <= total * 95 for c in cum]), "B", "C"),
    )
    df = pd.DataFrame({"abc": cls, "rev": rev})
    out = (
        df.groupby("abc")
        .agg(n_parts=("rev", "size"), revenue_micro=("rev", "sum"))
        .reset_index()
        .sort_values("abc", kind="mergesort")
        .reset_index(drop=True)
    )
    out["n_parts"] = out["n_parts"].astype(np.int64)
    out["revenue_micro"] = out["revenue_micro"].astype(np.int64)
    return out


ORACLES58["orders_abc_classes"] = """
WITH pr AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                  * 100) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
c AS (
  SELECT pk, rev,
         sum(CAST(rev AS HUGEINT)) OVER (ORDER BY rev DESC, pk ASC
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(CAST(rev AS HUGEINT)) OVER () AS total
  FROM pr
),
k AS (
  SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
              WHEN cum * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc,
         rev
  FROM c
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS revenue_micro
FROM k GROUP BY abc ORDER BY abc"""


QUERIES58 = {
    "events_time_to_convert": q_events_time_to_convert,
    "orders_abc_classes": q_orders_abc_classes,
}
