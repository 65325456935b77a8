"""Driver-contract queries, wave 61 — ingest coverage gaps (zero-hour
gaps-and-islands per signal type, the "did the pipeline stall" report) and
order→first-ship latency percentiles (SLA tracking over a big×big key join).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES61: dict[str, str] = {}

_HOUR_US = 3_600_000_000
_SHIP_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_coverage_gaps — zero-hour islands on the dense hourly grid
# ---------------------------------------------------------------------------


def q_events_coverage_gaps(sf_dir: str):
    """Coverage report per event type over the GLOBAL dense hour grid
    (min..max hour across all types): how many hours carry zero events and
    the longest consecutive zero run — the ingest-stall detector.

    Scale shape: one (type, hour) count combiner → ONE tiny exchange bounded
    by |types| × calendar-hour domain → vectorized RLE (diff over the zero
    mask) per type on the bounded driver grid. Rows never shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        hrs = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "hr": hrs}
        )
        g = df.groupby(["event_type", "hr"], sort=False).size().rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| x calendar-hour domain
        .groupby(["event_type", "hr"])["cnt"]
        .sum()
    )
    h0 = int(hist.index.get_level_values("hr").min())
    h1 = int(hist.index.get_level_values("hr").max())
    span = h1 - h0 + 1
    rows = []
    for et in sorted(hist.index.get_level_values("event_type").unique()):
        x = np.zeros(span, dtype=np.int64)
        sub = hist.loc[et]
        x[sub.index.to_numpy(np.int64) - h0] = sub.to_numpy(np.int64)
        zero = x == 0
        n_zero = int(zero.sum())
        if n_zero:
            # RLE over the zero mask: run boundaries via diff of padded mask
            padded = np.concatenate([[False], zero, [False]])
            d = np.diff(padded.astype(np.int8))
            starts = np.where(d == 1)[0]
            ends = np.where(d == -1)[0]
            longest = int((ends - starts).max())
        else:
            longest = 0
        rows.append((et, span, n_zero, longest))
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "n_hours": np.array([r[1] for r in rows], np.int64),
            "n_zero_hours": np.array([r[2] for r in rows], np.int64),
            "longest_gap_hours": np.array([r[3] for r in rows], np.int64),
        }
    )


ORACLES61["events_coverage_gaps"] = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
types AS (SELECT DISTINCT event_type FROM h),
grid AS (
  SELECT t.event_type, g.h0 + CAST(r.range AS BIGINT) AS hr
  FROM g CROSS JOIN range(0, 200000) r CROSS JOIN types t
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.event_type, grid.hr, coalesce(h.cnt, 0) AS cnt
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.hr = grid.hr
),
z AS (
  SELECT event_type, hr,
         hr - row_number() OVER (PARTITION BY event_type ORDER BY hr)
           AS island
  FROM x WHERE cnt = 0
),
runs AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS run_len
  FROM z GROUP BY event_type, island
)
SELECT t.event_type,
       CAST((SELECT h1 - h0 + 1 FROM g) AS BIGINT) AS n_hours,
       CAST(coalesce((SELECT sum(run_len) FROM runs r
                      WHERE r.event_type = t.event_type), 0) AS BIGINT)
         AS n_zero_hours,
       CAST(coalesce((SELECT max(run_len) FROM runs r
                      WHERE r.event_type = t.event_type), 0) AS BIGINT)
         AS longest_gap_hours
FROM types t ORDER BY t.event_type"""


# ---------------------------------------------------------------------------
# orders_ship_latency — order→first-ship latency percentiles per priority
# ---------------------------------------------------------------------------


def q_orders_ship_latency(sf_dir: str):
    """SLA report: days from order date to the FIRST lineitem ship date, per
    order priority — lower-median, lower-p90 and max, all integer rank picks.

    Scale shape (big×big key join without `Dataset.join`): per-batch
    (orderkey → min ship-day) partials from lineitem and tagged order rows
    share ONE orderkey-bucket exchange; the per-bucket vectorized merge
    re-reduces the min and joins — then only a bounded
    (priority, latency-day) histogram leaves the buckets, and the driver
    picks ranks from it."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        day = pa.compute.cast(t["l_shipdate"], pa.int64()).to_numpy() // 86_400_000_000
        g = (
            pd.DataFrame({"k": t["l_orderkey"].to_numpy(), "sday": day})
            .groupby("k", sort=False)["sday"]
            .min()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "k": g["k"].astype(np.int64),
                "sday": g["sday"].astype(np.int64),
                "oday": np.int64(-1),
                "pri": "",
                "_b": (g["k"].to_numpy(np.int64) % _SHIP_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        day = (
            pa.compute.cast(t["o_orderdate"], pa.int64()).to_numpy() // 86_400_000_000
        )
        k = t["o_orderkey"].to_numpy()
        return pd.DataFrame(
            {
                "k": k.astype(np.int64),
                "sday": np.int64(-1),
                "oday": day.astype(np.int64),
                "pri": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                "_b": (k.astype(np.int64) % _SHIP_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["oday"] >= 0).to_numpy()
        fs = (
            g.loc[~is_o]
            .groupby("k", sort=False)["sday"]
            .min()
            .reset_index()
        )
        o = g.loc[is_o, ["k", "oday", "pri"]]
        m = o.merge(fs, on="k")
        d = m["sday"].to_numpy(np.int64) - m["oday"].to_numpy(np.int64)
        h = (
            pd.DataFrame({"pri": m["pri"].to_numpy(), "d": d})
            .groupby(["pri", "d"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        h["cnt"] = h["cnt"].astype(np.int64)
        return h

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_rows, batch_format="pyarrow")
    hist = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |priorities| x latency-day domain
        .groupby(["pri", "d"])["cnt"]
        .sum()
    )
    rows = []
    for pri in sorted(hist.index.get_level_values("pri").unique()):
        sub = hist.loc[pri].sort_index()
        vals = sub.index.to_numpy(np.int64)
        cum = sub.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        p50 = int(vals[int(np.argmax(cum >= (n + 1) // 2))])
        p90 = int(vals[int(np.argmax(cum >= (9 * n + 9) // 10))])
        rows.append((pri, n, p50, p90, int(vals[-1])))
    return pd.DataFrame(
        {
            "pri": [r[0] for r in rows],
            "n_orders": np.array([r[1] for r in rows], np.int64),
            "p50_days": np.array([r[2] for r in rows], np.int64),
            "p90_days": np.array([r[3] for r in rows], np.int64),
            "max_days": np.array([r[4] for r in rows], np.int64),
        }
    )


ORACLES61["orders_ship_latency"] = """
WITH fs AS (
  SELECT l_orderkey, min(epoch_us(l_shipdate) // 86400000000) AS sday
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o_orderpriority AS pri,
         fs.sday - epoch_us(o_orderdate) // 86400000000 AS d
  FROM orders JOIN fs ON fs.l_orderkey = o_orderkey
),
r AS (
  SELECT pri, d, row_number() OVER (PARTITION BY pri ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY pri) AS n
  FROM j
)
SELECT pri,
       CAST(any_value(n) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN rn = (n + 1) // 2 THEN d END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN rn = (9 * n + 9) // 10 THEN d END) AS BIGINT)
         AS p90_days,
       CAST(max(d) AS BIGINT) AS max_days
FROM r GROUP BY pri ORDER BY pri"""


QUERIES61 = {
    "events_coverage_gaps": q_events_coverage_gaps,
    "orders_ship_latency": q_orders_ship_latency,
}
