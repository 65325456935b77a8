"""Driver-contract queries, wave 320 — Chapman capture-recapture
estimation of the customer universe from two month samples (vs the true
registry count) and the age-of-information staleness curve of the event
stream sampled at hourly ticks. Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES320: dict[str, str] = {}

_HOUR_US = 3_600_000_000
_CR_BUCKETS = 64


# ---------------------------------------------------------------------------
# customer_capture_recapture — Chapman estimate of the customer universe
# ---------------------------------------------------------------------------


def q_customer_capture_recapture(sf_dir: str):
    """Capture-recapture: sample A = customers ordering in the FIRST
    calendar month of the window, sample B = customers in the LAST
    month; the Chapman estimator
    N = (nA + 1)(nB + 1) / (m + 1) - 1 (m = recaptured) estimates the
    ordering universe, compared to the true registry count. Counting is
    exact; one division. One row: n_a, n_b, n_both, chapman_milli,
    true_customers, coverage_micro (estimate / truth).

    Scale shape: (month, custkey) distinct pairs ride one
    custkey-bucket exchange; each bucket emits three scalars."""

    def bounds(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        ym = (
            df["o_orderdate"].dt.year.to_numpy(np.int64) * 12
            + df["o_orderdate"].dt.month.to_numpy(np.int64) - 1
        )
        return pd.DataFrame(
            {"mn": [np.int64(ym.min())], "mx": [np.int64(ym.max())]}
        )

    meta = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
        .map_batches(bounds, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "n_a", "n_b", "n_both", "chapman_milli", "true_customers",
        "coverage_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if meta.empty:
        return empty
    m0, m1 = int(meta["mn"].min()), int(meta["mx"].max())
    if m0 == m1:
        return empty

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        ym = (
            df["o_orderdate"].dt.year.to_numpy(np.int64) * 12
            + df["o_orderdate"].dt.month.to_numpy(np.int64) - 1
        )
        ck = df["o_custkey"].to_numpy(np.int64)
        sel = (ym == m0) | (ym == m1)
        out = pd.DataFrame(
            {"cust": ck[sel], "in_a": (ym[sel] == m0).astype(np.int64),
             "in_b": (ym[sel] == m1).astype(np.int64)}
        ).groupby("cust", as_index=False).max()
        out["_b"] = (out["cust"].to_numpy(np.int64) % _CR_BUCKETS).astype(
            np.int64
        )
        return out.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("cust")[["in_a", "in_b"]].max()
        return pd.DataFrame(
            {
                "na": [np.int64(int(per["in_a"].sum()))],
                "nb": [np.int64(int(per["in_b"].sum()))],
                "m": [np.int64(int(
                    ((per["in_a"] == 1) & (per["in_b"] == 1)).sum()
                ))],
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_custkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_true = int(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        ).count()
    )
    na, nb, m = int(parts["na"]), int(parts["nb"]), int(parts["m"])
    if na == 0 or nb == 0 or n_true == 0:
        return empty
    chapman = float(na + 1) * float(nb + 1) / float(m + 1) - 1.0
    coverage = chapman / float(n_true)
    return pd.DataFrame(
        [
            (
                np.int64(na), np.int64(nb), np.int64(m),
                np.int64(np.floor(chapman * 1_000.0 + 0.5)),
                np.int64(n_true),
                np.int64(np.floor(coverage * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES320["customer_capture_recapture"] = """
WITH ords AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS ym
  FROM orders
),
b AS (SELECT min(ym) AS m0, max(ym) AS m1 FROM ords),
per AS (
  SELECT o_custkey,
         CAST(max(CASE WHEN ym = b.m0 THEN 1 ELSE 0 END) AS BIGINT)
           AS in_a,
         CAST(max(CASE WHEN ym = b.m1 THEN 1 ELSE 0 END) AS BIGINT)
           AS in_b
  FROM ords, b GROUP BY 1
),
agg AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS na, CAST(sum(in_b) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS m
  FROM per
),
tr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer)
SELECT agg.na AS n_a, agg.nb AS n_b, agg.m AS n_both,
       CAST(floor((CAST(agg.na + 1 AS DOUBLE) * (agg.nb + 1)
                   / (agg.m + 1) - 1.0) * 1000.0 + 0.5) AS BIGINT)
         AS chapman_milli,
       tr.n AS true_customers,
       CAST(floor((CAST(agg.na + 1 AS DOUBLE) * (agg.nb + 1)
                   / (agg.m + 1) - 1.0) / tr.n * 1000000.0 + 0.5)
            AS BIGINT) AS coverage_micro
FROM agg, tr, b
WHERE agg.na > 0 AND agg.nb > 0 AND tr.n > 0 AND b.m0 <> b.m1"""


# ---------------------------------------------------------------------------
# events_age_of_information — staleness at hourly sampling ticks
# ---------------------------------------------------------------------------


def q_events_age_of_information(sf_dir: str):
    """Age of information: a consumer polling at every hour boundary
    within the observation span sees data aged
    (tick - latest event ts <= tick). Ages in ms fold from the per-hour
    latest-event table with a driver-side cummax carry across silent
    hours — EXACT integers, one division for the mean. One row:
    n_ticks, mean_age_ms_milli, max_age_ms, p_stale_1h_micro (share of
    ticks older than one hour)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        hr = us // _HOUR_US
        g = pd.DataFrame({"hr": hr, "us": us}).groupby("hr")["us"].max()
        return pd.DataFrame(
            {"hr": g.index.to_numpy(np.int64), "mx": g.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")["mx"]
        .max()
    )
    cols = ["n_ticks", "mean_age_ms_milli", "max_age_ms", "p_stale_1h_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    h0, h1 = int(h.index.min()), int(h.index.max())
    n_hours = h1 - h0 + 1
    last = np.full(n_hours, -1, dtype=np.int64)
    last[h.index.to_numpy(np.int64) - h0] = h.to_numpy(np.int64)
    last = np.maximum.accumulate(last)
    # ticks at the END of each hour (start of the next), skipping hours
    # with no event seen yet
    ticks = (h0 + np.arange(1, n_hours + 1)) * _HOUR_US
    seen = last >= 0
    ages_us = (ticks[seen] - last[seen]).astype(object)
    n = len(ages_us)
    if n == 0:
        return empty
    ages_ms = np.array([int(a) // 1000 for a in ages_us], dtype=object)
    total = int(sum(int(a) for a in ages_ms))
    mx = int(max(int(a) for a in ages_ms))
    stale = int(sum(1 for a in ages_ms if int(a) > 3_600_000))
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(
                    float(total) / float(n) * 1_000.0 + 0.5
                )),
                np.int64(mx),
                np.int64(np.floor(
                    float(stale) / float(n) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES320["events_age_of_information"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(max(epoch_us(ts)) AS BIGINT) AS mx
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  SELECT g.h0 + CAST(r.range AS BIGINT) AS hr
  FROM g CROSS JOIN range(0, 500000) r
  WHERE r.range <= g.h1 - g.h0
),
carry AS (
  SELECT grid.hr,
         max(h.mx) OVER (ORDER BY grid.hr
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_us
  FROM grid LEFT JOIN h USING (hr)
),
ages AS (
  SELECT ((hr + 1) * {_HOUR_US} - last_us) // 1000 AS age_ms
  FROM carry WHERE last_us IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(age_ms) AS BIGINT) AS total,
         CAST(max(age_ms) AS BIGINT) AS mx,
         CAST(sum(CASE WHEN age_ms > 3600000 THEN 1 ELSE 0 END) AS BIGINT)
           AS stale
  FROM ages
)
SELECT n AS n_ticks,
       CAST(floor(CAST(total AS DOUBLE) / n * 1000.0 + 0.5) AS BIGINT)
         AS mean_age_ms_milli,
       mx AS max_age_ms,
       CAST(floor(CAST(stale AS DOUBLE) / n * 1000000.0 + 0.5) AS BIGINT)
         AS p_stale_1h_micro
FROM agg
WHERE n > 0"""


QUERIES320 = {
    "customer_capture_recapture": q_customer_capture_recapture,
    "events_age_of_information": q_events_age_of_information,
}
