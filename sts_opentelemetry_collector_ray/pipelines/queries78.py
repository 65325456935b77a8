"""Driver-contract queries, wave 78 — per-customer median inter-order gap
(the reorder-cadence feature behind churn/LTV models: an exact distributed
median per key) and yearly revenue share of one part type (Q8-shaped market
share with exact integer ratio). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly.

Median determinism: gaps are integer DAYS; the even-count midpoint is
(a+b)·500000 micro — an exact integer — and DuckDB's interpolated
``median()`` lands on the same value because (a+b)/2 is exact in float64 for
day-scale ints. Share determinism: micro ratio computed as exact integer
floor division on both engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES78: dict[str, str] = {}

_GAP_BUCKETS = 64
_SHARE_TYPE = "PROMO"
_SHARE_BUCKETS = 32
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# orders_gap_median — exact per-customer median inter-order gap (days)
# ---------------------------------------------------------------------------


def q_orders_gap_median(sf_dir: str):
    """Reorder cadence: per customer with ≥ 2 orders, the exact median of
    the gaps (in days) between consecutive orders sorted by date — the
    multiset of consecutive-sorted-day differences is tie-order independent.

    Scale shape: (custkey, day) rows share ONE custkey-bucket exchange; the
    per-bucket kernel is fully vectorized — lexsort by (cust, day), segment
    diffs, a second lexsort by (cust, gap), then per-segment median indexing
    off cumulative offsets. Buckets own customers completely and emit final
    rows; nothing reaches the driver."""

    def rows(t: pa.Table) -> pd.DataFrame:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame(
            {"c": c, "d": d, "_b": (c % _GAP_BUCKETS).astype(np.int64)}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        o = np.lexsort((d, c))
        c, d = c[o], d[o]
        same = np.empty(len(c), dtype=bool)
        same[0] = False
        same[1:] = c[1:] == c[:-1]
        gaps = (d[1:] - d[:-1])[same[1:]]
        gc = c[1:][same[1:]]
        if len(gc) == 0:
            return pd.DataFrame(
                {
                    "o_custkey": np.array([], np.int64),
                    "n_orders": np.array([], np.int64),
                    "median_gap_micro": np.array([], np.int64),
                }
            )
        o2 = np.lexsort((gaps, gc))
        gc, gaps = gc[o2], gaps[o2]
        keys, starts = np.unique(gc, return_index=True)
        ends = np.append(starts[1:], len(gc))
        m = ends - starts
        mid = starts + (m - 1) // 2
        odd = (m % 2).astype(bool)
        med = np.where(
            odd,
            gaps[mid] * 1_000_000,
            (gaps[mid] + gaps[np.minimum(mid + 1, len(gaps) - 1)]) * 500_000,
        )
        n_orders = pd.Series(c).groupby(c).size().reindex(keys).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "o_custkey": keys,
                "n_orders": n_orders,
                "median_gap_micro": med.astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES78["orders_gap_median"] = f"""
WITH d AS (
  SELECT o_custkey AS c, epoch_us(o_orderdate) // {_DAY_US} AS day FROM orders
),
g AS (
  SELECT c, day - lag(day) OVER (PARTITION BY c ORDER BY day) AS gap FROM d
),
a AS (SELECT c, CAST(count(*) AS BIGINT) AS n_orders FROM d GROUP BY 1),
md AS (
  SELECT c,
         CAST(floor(median(gap) * 1000000 + 0.5) AS BIGINT)
           AS median_gap_micro
  FROM g WHERE gap IS NOT NULL GROUP BY 1
)
SELECT a.c AS o_custkey, a.n_orders, md.median_gap_micro
FROM a JOIN md ON md.c = a.c
ORDER BY 1"""


# ---------------------------------------------------------------------------
# part_type_share — yearly revenue share of one part type (Q8 shape)
# ---------------------------------------------------------------------------


def q_part_type_share(sf_dir: str):
    """Q8-shaped market share: per ship year, the fraction (micro, exact
    integer floor division) of lineitem revenue attributable to parts of
    type '{T}', plus the total yearly revenue.

    Scale shape: lineitems pre-aggregate per (partkey, year) micro-revenue
    inside each batch and share ONE partkey-bucket exchange with the part
    rows; per-bucket merge joins and emits per-(year, is_target) integer
    partials — the driver re-reduces ≤ 2·|years|·|buckets| rows and does the
    exact ratio in Python ints (overflow-free).""".format(T=_SHARE_TYPE)

    def li_partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        pk = t["l_partkey"].to_numpy().astype(np.int64)
        yr = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - disc) * 1_000_000.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "yr": yr, "rev": rev})
            .groupby(["pk", "yr"], sort=False, as_index=False)
            .sum()
        )
        return pd.DataFrame(
            {
                "pk": g["pk"].to_numpy(np.int64),
                "yr": g["yr"].to_numpy(np.int64),
                "rev": g["rev"].to_numpy(np.int64),
                "typ": "",
                "_b": (g["pk"].to_numpy(np.int64) % _SHARE_BUCKETS).astype(np.int64),
            }
        )

    def p_rows(t: pa.Table) -> pd.DataFrame:
        pk = t["p_partkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "pk": pk,
                "yr": np.int64(-1),
                "rev": np.int64(0),
                "typ": np.asarray(t["p_type"].to_numpy(zero_copy_only=False)),
                "_b": (pk % _SHARE_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_p = (g["yr"] < 0).to_numpy()
        p = g.loc[is_p, ["pk", "typ"]]
        li = g.loc[~is_p, ["pk", "yr", "rev"]]
        j = li.merge(p, on="pk")
        j["is_t"] = (j["typ"] == _SHARE_TYPE).astype(np.int64)
        out = j.groupby(["yr", "is_t"], sort=False, as_index=False)["rev"].sum()
        return pd.DataFrame(
            {
                "yr": out["yr"].to_numpy(np.int64),
                "is_t": out["is_t"].to_numpy(np.int64),
                "rev": out["rev"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")
    p = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(p_rows, batch_format="pyarrow")
    part = (
        li.union(p)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ 2·|years| rows per bucket
        .groupby(["yr", "is_t"], as_index=False)["rev"]
        .sum()
    )
    years = np.sort(part["yr"].unique())
    rows = []
    for y in years:
        sel = part[part["yr"] == y]
        den = int(sel["rev"].sum())
        num = int(sel.loc[sel["is_t"] == 1, "rev"].sum())
        rows.append(
            {
                "ship_year": int(y),
                "share_micro": (num * 1_000_000) // den if den else 0,
                "total_micro": den,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("ship_year", "share_micro", "total_micro"):
        out[c] = out[c].astype(np.int64)
    return out


ORACLES78["part_type_share"] = f"""
WITH l AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
              AS HUGEINT) AS rev,
         CASE WHEN p_type = '{_SHARE_TYPE}' THEN 1 ELSE 0 END AS is_t
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
a AS (
  SELECT ship_year,
         sum(rev) AS den,
         sum(CASE WHEN is_t = 1 THEN rev ELSE 0 END) AS num
  FROM l GROUP BY 1
)
SELECT ship_year,
       CAST(CASE WHEN den = 0 THEN 0
                 ELSE (num * 1000000) // den END AS BIGINT) AS share_micro,
       CAST(den AS BIGINT) AS total_micro
FROM a ORDER BY ship_year"""


QUERIES78 = {
    "orders_gap_median": q_orders_gap_median,
    "part_type_share": q_part_type_share,
}
