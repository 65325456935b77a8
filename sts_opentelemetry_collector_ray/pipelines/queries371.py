"""Driver-contract queries, wave 371 — cohort revenue retention
(first-order-year cohorts x order year) and inter-purchase gap
statistics by customer market segment (bucketed dimension merge).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES371: dict[str, str] = {}

_CO_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# orders_cohort_revenue — cohort-year x order-year revenue table
# ---------------------------------------------------------------------------


def q_orders_cohort_revenue(sf_dir: str):
    """Cohort table: customers grouped by first-order year; per
    (cohort_year, order_year) the revenue cents and its share of the
    cohort's own first-year revenue — the classic retention triangle,
    exact integers plus micro shares. Per cell: cohort_year,
    order_year, n_customers_active, revenue_cents, vs_first_micro.

    Scale shape: per-customer (first year, yearly cents) inside ONE
    custkey-bucket exchange; cells fold into a bounded year x year
    table."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        yr = df["o_orderdate"].dt.year.to_numpy(np.int64)
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        out = pd.DataFrame(
            {"k": df["o_custkey"].to_numpy(np.int64), "yr": yr, "s": cents}
        )
        out["_b"] = (out["k"] % _CO_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "cy": pd.Series([], dtype=np.int64),
                "yr": pd.Series([], dtype=np.int64),
                "na": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        first = g.groupby("k")["yr"].min().rename("cy")
        per = (
            g.groupby(["k", "yr"], as_index=False)["s"]
            .sum()
            .join(first, on="k")
        )
        cells = (
            per.groupby(["cy", "yr"], as_index=False)
            .agg(na=("k", "nunique"), s=("s", "sum"))
        )
        return cells.astype(np.int64)

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["cy", "yr"])[["na", "s"]]
        .sum()
        .reset_index()
        .sort_values(["cy", "yr"])
    )
    cols = ["cohort_year", "order_year", "n_customers_active",
            "revenue_cents", "vs_first_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cells.empty:
        return empty
    base = {
        int(r["cy"]): int(r["s"])
        for _, r in cells[cells["cy"] == cells["yr"]].iterrows()
    }
    rows = []
    for _, r in cells.iterrows():
        b = base.get(int(r["cy"]), 0)
        if b <= 0:
            continue
        rows.append(
            (
                np.int64(int(r["cy"])), np.int64(int(r["yr"])),
                np.int64(int(r["na"])), np.int64(int(r["s"])),
                np.int64(np.floor(
                    float(int(r["s"])) / float(b) * 1_000_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES371["orders_cohort_revenue"] = """
WITH per AS (
  SELECT o_custkey AS k, CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM orders GROUP BY 1, 2
),
first AS (SELECT k, min(yr) AS cy FROM per GROUP BY 1),
cells AS (
  SELECT first.cy, per.yr,
         CAST(count(*) AS BIGINT) AS na, CAST(sum(per.s) AS BIGINT) AS s
  FROM per JOIN first USING (k)
  GROUP BY 1, 2
),
base AS (SELECT cy, s AS b FROM cells WHERE cy = yr)
SELECT cells.cy AS cohort_year, cells.yr AS order_year,
       cells.na AS n_customers_active, cells.s AS revenue_cents,
       CAST(floor(CAST(cells.s AS DOUBLE) / base.b * 1000000.0 + 0.5)
            AS BIGINT) AS vs_first_micro
FROM cells JOIN base USING (cy)
WHERE base.b > 0
ORDER BY cohort_year, order_year"""


# ---------------------------------------------------------------------------
# orders_gap_by_segment — inter-purchase gaps by market segment
# ---------------------------------------------------------------------------


def q_orders_gap_by_segment(sf_dir: str):
    """Re-purchase cadence by segment: per customer the day gaps
    between consecutive orders (date order, orderkey ties); the
    customer's market segment joins in on the SAME custkey-bucket
    exchange (bucketed pandas merge, no Dataset.join). Exact gap
    histograms per segment. Per segment: mktsegment, n_gaps,
    median_gap_days, mean_gap_days_milli."""

    def o_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "k": df["o_custkey"].to_numpy(np.int64),
                "d": df["o_orderdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // _DAY_US,
                "ok": df["o_orderkey"].to_numpy(np.int64),
            }
        )
        out["_b"] = (out["k"] % _CO_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(0)
        out["seg"] = ""
        return out[["_b", "_src", "k", "d", "ok", "seg"]]

    def c_partial(t: pa.Table) -> pd.DataFrame:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame(
            {
                "k": k,
                "d": np.zeros(len(k), np.int64),
                "ok": np.zeros(len(k), np.int64),
                "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            }
        )
        out["_b"] = (out["k"] % _CO_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(1)
        return out[["_b", "_src", "k", "d", "ok", "seg"]]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    ).map_batches(o_partial, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(c_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "seg": pd.Series([], dtype=object),
                "gap": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        o = g[g["_src"] == 0]
        c = g[g["_src"] == 1]
        if len(o) == 0 or len(c) == 0:
            return zero
        o = o.sort_values(["k", "d", "ok"], kind="stable")
        k = o["k"].to_numpy(np.int64)
        d = o["d"].to_numpy(np.int64)
        same = k[1:] == k[:-1]
        gaps = pd.DataFrame(
            {"k": k[1:][same], "gap": (d[1:] - d[:-1])[same]}
        )
        if gaps.empty:
            return zero
        segmap = c.set_index("k")["seg"]
        gaps["seg"] = gaps["k"].map(segmap)
        gaps = gaps.dropna(subset=["seg"])
        if gaps.empty:
            return zero
        h = (
            gaps.groupby(["seg", "gap"])
            .size()
            .rename("c")
            .reset_index()
        )
        h["c"] = h["c"].astype(np.int64)
        h["gap"] = h["gap"].astype(np.int64)
        return h

    hist = (
        orders.union(cust)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["seg", "gap"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["mktsegment", "n_gaps", "median_gap_days",
            "mean_gap_days_milli"]
    empty = pd.DataFrame(
        {
            "mktsegment": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if hist.empty:
        return empty
    rows = []
    for seg in sorted(hist["seg"].unique()):
        sub = hist[hist["seg"] == seg].sort_values("gap")
        g = sub["gap"].to_numpy(np.int64)
        c = sub["c"].to_numpy(np.int64)
        n = int(c.sum())
        if n == 0:
            continue
        cum = np.cumsum(c)
        med = int(g[int(np.searchsorted(cum, (n + 1) // 2, side="left"))])
        total = int((g.astype(object) * c.astype(object)).sum())
        rows.append(
            (
                seg, np.int64(n), np.int64(med),
                np.int64(np.floor(
                    float(total) / float(n) * 1_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES371["orders_gap_by_segment"] = f"""
WITH seq AS (
  SELECT o_custkey AS k,
         epoch_us(o_orderdate) // {_DAY_US}
           - lag(epoch_us(o_orderdate) // {_DAY_US}) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS gap
  FROM orders
),
gaps AS (
  SELECT seq.k, CAST(seq.gap AS BIGINT) AS gap
  FROM seq WHERE seq.gap IS NOT NULL
),
tagged AS (
  SELECT c.c_mktsegment AS seg, gaps.gap
  FROM gaps JOIN customer c ON c.c_custkey = gaps.k
),
h AS (
  SELECT seg, gap, CAST(count(*) AS BIGINT) AS c
  FROM tagged GROUP BY 1, 2
),
nn AS (
  SELECT seg, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(gap AS HUGEINT) * c) AS HUGEINT) AS tot
  FROM h GROUP BY 1
),
cum AS (
  SELECT seg, gap, sum(c) OVER (PARTITION BY seg ORDER BY gap) AS cc
  FROM h
),
med AS (
  SELECT cum.seg, min(cum.gap) AS v
  FROM cum JOIN nn USING (seg)
  WHERE cum.cc >= (nn.n + 1) // 2
  GROUP BY 1
)
SELECT nn.seg AS mktsegment, nn.n AS n_gaps, med.v AS median_gap_days,
       CAST(floor(CAST(nn.tot AS DOUBLE) / nn.n * 1000.0 + 0.5)
            AS BIGINT) AS mean_gap_days_milli
FROM nn JOIN med USING (seg)
WHERE nn.n > 0
ORDER BY mktsegment"""


QUERIES371 = {
    "orders_cohort_revenue": q_orders_cohort_revenue,
    "orders_gap_by_segment": q_orders_gap_by_segment,
}
