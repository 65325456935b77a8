"""Driver-contract queries, wave 66 — Q13-shaped customer order-count
distribution (the count-of-counts histogram INCLUDING zero-order customers —
the left-join shape naive pipelines drop) and hourly peak detection (strict
local maxima above the mean, per signal type). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES66: dict[str, str] = {}

_Q13_BUCKETS = 64
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# q13_custdist — distribution of customers by order count (incl. zero)
# ---------------------------------------------------------------------------


def q_q13_custdist(sf_dir: str):
    """TPC-H Q13 shape: how many customers placed exactly k orders, for every
    k INCLUDING 0 — the left-join count-of-counts histogram.

    Scale shape: orders emit per-batch (custkey → count) partials; customer
    emits bare keys; both share ONE custkey-bucket exchange where the
    vectorized merge re-reduces counts and left-joins the key set — only the
    bounded (k → n_customers) histogram leaves the buckets."""

    def o_partial(t: pa.Table) -> pd.DataFrame:
        k = t["o_custkey"].to_numpy().astype(np.int64)
        g = pd.Series(k).groupby(k).size()
        return pd.DataFrame(
            {
                "cust": g.index.to_numpy(np.int64),
                "cnt": g.to_numpy(np.int64),
                "is_cust": np.zeros(len(g), np.int64),
                "_b": (g.index.to_numpy(np.int64) % _Q13_BUCKETS).astype(np.int64),
            }
        )

    def c_rows(t: pa.Table) -> pd.DataFrame:
        k = t["c_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "cust": k,
                "cnt": np.zeros(len(k), np.int64),
                "is_cust": np.ones(len(k), np.int64),
                "_b": (k % _Q13_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cust_keys = g.loc[g["is_cust"] == 1, "cust"]
        counts = (
            g.loc[g["is_cust"] == 0]
            .groupby("cust", sort=False)["cnt"]
            .sum()
        )
        per_cust = counts.reindex(cust_keys.to_numpy(np.int64), fill_value=0)
        h = pd.Series(per_cust.to_numpy(np.int64)).value_counts()
        return pd.DataFrame(
            {
                "c_count": h.index.to_numpy(np.int64),
                "n_customers": h.to_numpy(np.int64),
            }
        )

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(o_partial, batch_format="pyarrow")
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(c_rows, batch_format="pyarrow")
    out = (
        o.union(c)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: count-domain per bucket
        .groupby("c_count")["n_customers"]
        .sum()
        .reset_index()
        .sort_values("c_count", kind="mergesort")
        .reset_index(drop=True)
    )
    out["c_count"] = out["c_count"].astype(np.int64)
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out


ORACLES66["q13_custdist"] = """
WITH pc AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
FROM pc GROUP BY c_count ORDER BY c_count"""


# ---------------------------------------------------------------------------
# events_peak_hours — strict local maxima above the per-type mean
# ---------------------------------------------------------------------------


def q_events_peak_hours(sf_dir: str):
    """Peak detection per type on the dense hourly grid: hours that are
    STRICT local maxima (greater than both neighbors; grid edges never
    qualify) AND above the per-type mean (integer predicate cnt·n > Σ).
    Reports the peak count and the tallest peak's hour (ties → earliest).

    Scale shape: the events_ewma combiner exchange, then vectorized
    neighbor/mean masks over the bounded grid."""

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
        n = span
        s = int(x.sum())
        peak = np.zeros(span, dtype=bool)
        if span >= 3:
            peak[1:-1] = (
                (x[1:-1] > x[:-2]) & (x[1:-1] > x[2:]) & (x[1:-1] * n > s)
            )
        n_peaks = int(peak.sum())
        if n_peaks:
            idx = np.where(peak)[0]
            best = idx[np.argmax(x[idx])]  # argmax: first max -> earliest hr
            top_hr, top_cnt = int(best + h0), int(x[best])
        else:
            top_hr, top_cnt = -1, 0
        rows.append((et, n_peaks, top_hr, top_cnt))
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "n_peaks": np.array([r[1] for r in rows], np.int64),
            "top_peak_hr": np.array([r[2] for r in rows], np.int64),
            "top_peak_cnt": np.array([r[3] for r in rows], np.int64),
        }
    )


ORACLES66["events_peak_hours"] = f"""
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
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cnt) AS BIGINT) AS s FROM x GROUP BY 1),
w AS (
  SELECT x.event_type, x.hr, x.cnt,
         lag(cnt) OVER (PARTITION BY event_type ORDER BY hr) AS prv,
         lead(cnt) OVER (PARTITION BY event_type ORDER BY hr) AS nxt
  FROM x
),
p AS (
  SELECT w.event_type, w.hr, w.cnt
  FROM w JOIN m USING (event_type)
  WHERE prv IS NOT NULL AND nxt IS NOT NULL
    AND cnt > prv AND cnt > nxt AND cnt * m.n > m.s
)
SELECT t.event_type,
       CAST(coalesce((SELECT count(*) FROM p
                      WHERE p.event_type = t.event_type), 0) AS BIGINT)
         AS n_peaks,
       CAST(coalesce((SELECT hr FROM p WHERE p.event_type = t.event_type
                      ORDER BY cnt DESC, hr ASC LIMIT 1), -1) AS BIGINT)
         AS top_peak_hr,
       CAST(coalesce((SELECT cnt FROM p WHERE p.event_type = t.event_type
                      ORDER BY cnt DESC, hr ASC LIMIT 1), 0) AS BIGINT)
         AS top_peak_cnt
FROM types t ORDER BY t.event_type"""


QUERIES66 = {
    "q13_custdist": q_q13_custdist,
    "events_peak_hours": q_events_peak_hours,
}
