"""Driver-contract queries, wave 375 — the Pareto skyline of customers
over (order frequency, monetary cents) and a region/nation revenue
ROLLUP (hierarchical shares through customer -> nation -> region).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES375: dict[str, str] = {}

_SK_BUCKETS = 64


# ---------------------------------------------------------------------------
# orders_customer_skyline — Pareto front over (frequency, monetary)
# ---------------------------------------------------------------------------


def q_orders_customer_skyline(sf_dir: str):
    """Skyline: the Pareto-optimal (frequency, monetary) points — no
    other customer weakly dominates with one strict improvement.
    Reduction: per frequency level keep the max monetary, then a
    descending-frequency scan keeps points whose monetary beats every
    higher-frequency candidate. Pure integers. Per point: freq,
    monetary_cents, n_customers_at_point."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"k": df["o_custkey"].to_numpy(np.int64), "n": 1, "s": cents}
            )
            .groupby("k", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    per = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")[["n", "s"]]
        .sum()
    )
    cols = ["freq", "monetary_cents", "n_customers_at_point"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if per.empty:
        return empty
    # per frequency level: the max monetary and how many customers sit
    # exactly on that (freq, max) point
    by_f = per.groupby("n")["s"].max()
    counts = per.groupby(["n", "s"]).size()
    best = -1
    rows = []
    for f in sorted(by_f.index, reverse=True):
        m = int(by_f[f])
        if m > best:
            rows.append(
                (
                    np.int64(int(f)), np.int64(m),
                    np.int64(int(counts[(f, m)])),
                )
            )
            best = m
    rows.sort(key=lambda r: int(r[0]))
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES375["orders_customer_skyline"] = """
WITH per AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY 1
),
byf AS (SELECT f, max(m) AS m FROM per GROUP BY 1),
sky AS (
  SELECT f, m,
         coalesce(max(m) OVER (ORDER BY f DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), -1) AS best_above
  FROM byf
),
pts AS (SELECT f, m FROM sky WHERE m > best_above)
SELECT pts.f AS freq, pts.m AS monetary_cents,
       CAST((SELECT count(*) FROM per
             WHERE per.f = pts.f AND per.m = pts.m) AS BIGINT)
         AS n_customers_at_point
FROM pts
ORDER BY freq"""


# ---------------------------------------------------------------------------
# sales_region_rollup — hierarchical revenue rollup
# ---------------------------------------------------------------------------


def q_sales_region_rollup(sf_dir: str):
    """OLAP ROLLUP: order revenue attributed through customer ->
    nation -> region; rows at nation level (share of its region),
    region level (share of total) and the grand total. The custkey ->
    nationkey merge runs in ONE bucket exchange; the nation/region
    dimensions broadcast. Per row: level, region_name, nation_name,
    revenue_cents, share_of_parent_micro."""
    import ray as _ray

    nation = (
        ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name",
                                       "n_regionkey"])
        .to_pandas()
    )
    region = (
        ray.data.read_parquet(f"{sf_dir}/region.parquet",
                              columns=["r_regionkey", "r_name"])
        .to_pandas()
    )

    def o_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "k": df["o_custkey"].to_numpy(np.int64),
                "s": np.floor(
                    df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
                "nk": np.int64(-1),
            }
        )
        out["_b"] = (out["k"] % _SK_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(0)
        return out[["_b", "_src", "k", "s", "nk"]]

    def c_partial(t: pa.Table) -> pd.DataFrame:
        k = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame(
            {
                "k": k,
                "s": np.zeros(len(k), np.int64),
                "nk": t["c_nationkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        out["_b"] = (out["k"] % _SK_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(1)
        return out[["_b", "_src", "k", "s", "nk"]]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(o_partial, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(c_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "nk": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.int64),
            }
        )
        o = g[g["_src"] == 0]
        c = g[g["_src"] == 1]
        if len(o) == 0 or len(c) == 0:
            return zero
        nkmap = c.set_index("k")["nk"]
        o = o.assign(nk=o["k"].map(nkmap)).dropna(subset=["nk"])
        if o.empty:
            return zero
        out = o.groupby("nk", as_index=False)["s"].sum()
        out["nk"] = out["nk"].astype(np.int64)
        out["s"] = out["s"].astype(np.int64)
        return out[["nk", "s"]]

    per_nation = (
        orders.union(cust)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("nk")["s"]
        .sum()
        .reset_index()
    )
    cols = ["level", "region_name", "nation_name", "revenue_cents",
            "share_of_parent_micro"]
    empty = pd.DataFrame(
        {
            "level": pd.Series([], dtype=object),
            "region_name": pd.Series([], dtype=object),
            "nation_name": pd.Series([], dtype=object),
            "revenue_cents": pd.Series([], dtype=np.int64),
            "share_of_parent_micro": pd.Series([], dtype=np.int64),
        }
    )
    if per_nation.empty:
        return empty
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name", "r_name"]]
    full = per_nation.merge(
        dim, left_on="nk", right_on="n_nationkey"
    )
    if full.empty:
        return empty
    total = int(full["s"].sum())
    if total <= 0:
        return empty
    per_region = full.groupby("r_name")["s"].sum()
    rows = [("total", "", "", np.int64(total), np.int64(1_000_000))]
    for r_ in sorted(per_region.index):
        rs = int(per_region[r_])
        rows.append(
            (
                "region", r_, "", np.int64(rs),
                np.int64(np.floor(
                    float(rs) / float(total) * 1_000_000.0 + 0.5
                )),
            )
        )
    for _, rr in full.sort_values(["r_name", "n_name"]).iterrows():
        rs = int(per_region[rr["r_name"]])
        if rs <= 0:
            continue
        rows.append(
            (
                "nation", rr["r_name"], rr["n_name"],
                np.int64(int(rr["s"])),
                np.int64(np.floor(
                    float(int(rr["s"])) / float(rs) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"revenue_cents": np.int64, "share_of_parent_micro": np.int64}
    )


ORACLES375["sales_region_rollup"] = """
WITH per AS (
  SELECT n.n_name AS nation_name, r.r_name AS region_name,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(s) AS BIGINT) AS t FROM per),
reg AS (
  SELECT region_name, CAST(sum(s) AS BIGINT) AS s FROM per GROUP BY 1
)
SELECT 'total' AS level, '' AS region_name, '' AS nation_name,
       tot.t AS revenue_cents,
       CAST(1000000 AS BIGINT) AS share_of_parent_micro
FROM tot WHERE tot.t > 0
UNION ALL
SELECT 'region', reg.region_name, '', reg.s,
       CAST(floor(CAST(reg.s AS DOUBLE) / tot.t * 1000000.0 + 0.5)
            AS BIGINT)
FROM reg, tot WHERE tot.t > 0
UNION ALL
SELECT 'nation', per.region_name, per.nation_name, per.s,
       CAST(floor(CAST(per.s AS DOUBLE) / reg.s * 1000000.0 + 0.5)
            AS BIGINT)
FROM per JOIN reg USING (region_name), tot
WHERE tot.t > 0 AND reg.s > 0"""


QUERIES375 = {
    "orders_customer_skyline": q_orders_customer_skyline,
    "sales_region_rollup": q_sales_region_rollup,
}
