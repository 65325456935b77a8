"""Driver-contract queries, wave 169 — yearly whale concentration (the
top-10 customers' revenue share per year: account-concentration risk over
time) and the part dimension census (brands per type and sizes per brand —
the dimensional-cardinality profile a cube planner needs). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES169: dict[str, str] = {}

_WHALE_K = 10


# ---------------------------------------------------------------------------
# orders_yearly_whales — top-10 customers' revenue share per year
# ---------------------------------------------------------------------------


def q_orders_yearly_whales(sf_dir: str):
    """Per year: order revenue cents of the top-10 customers (by exact
    per-customer yearly cents, ties broken by smaller custkey), the year
    total, and the concentration share in micro units.

    Scale shape: per-batch (cust, year, cents) combiner, ONE customer-bucket
    exchange completes (cust, year) totals, per-bucket local top-10 per year
    under the GLOBAL ordering key plus per-(bucket, year) totals; the driver
    merges ≤ 64 × |years| × 10 candidates."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        year = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "c": t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "y": year,
                    "cents": cents,
                }
            )
            .groupby(["c", "y"], sort=False, as_index=False)["cents"]
            .sum()
        )
        g["_b"] = (g["c"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"y": np.int64, "cents": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["c", "y"], sort=False, as_index=False)["cents"].sum()
        ytot = tot.groupby("y", sort=False)["cents"].sum().rename("ytot")
        top = (
            tot.sort_values(
                ["y", "cents", "c"], ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("y", sort=False)
            .head(_WHALE_K)
        )
        out = top.merge(ytot, left_on="y", right_index=True)
        return out.astype(
            {"c": np.int64, "y": np.int64, "cents": np.int64, "ytot": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: merge(g).assign(_b=g["_b"].iloc[0] if len(g) else -1),
            batch_format="pandas",
        )
        .to_pandas()  # bounded: 64 buckets × |years| × 10 candidates
    )
    empty = pd.DataFrame(
        {
            "year": pd.Series([], dtype=np.int64),
            "top_cents": pd.Series([], dtype=np.int64),
            "total_cents": pd.Series([], dtype=np.int64),
            "concentration_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "y" not in part.columns:
        return empty
    rows = []
    for y, g in part.groupby("y", sort=True):
        top = g.sort_values(
            ["cents", "c"], ascending=[False, True], kind="mergesort"
        ).head(_WHALE_K)
        top_cents = int(top["cents"].sum())
        total = int(g.drop_duplicates(["_b"])["ytot"].sum())
        rows.append(
            (
                int(y),
                top_cents,
                total,
                int(np.floor(top_cents / float(total) * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["year", "top_cents", "total_cents", "concentration_micro"],
    ).astype(np.int64)


ORACLES169["orders_yearly_whales"] = f"""
WITH cy AS (
  SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
r AS (
  SELECT y, cents,
         row_number() OVER (PARTITION BY y ORDER BY cents DESC, c) AS rk
  FROM cy
),
top AS (
  SELECT y, CAST(sum(cents) AS BIGINT) AS top_cents
  FROM r WHERE rk <= {_WHALE_K} GROUP BY 1
),
tot AS (SELECT y, CAST(sum(cents) AS BIGINT) AS total_cents FROM cy GROUP BY 1)
SELECT tot.y AS year, top.top_cents, tot.total_cents,
       CAST(floor(CAST(top.top_cents AS DOUBLE)
                  / CAST(tot.total_cents AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS concentration_micro
FROM tot JOIN top USING (y)"""


# ---------------------------------------------------------------------------
# part_dimension_census — cardinality profile of the part dimensions
# ---------------------------------------------------------------------------


def q_part_dimension_census(sf_dir: str):
    """Per part type: parts, distinct brands, distinct sizes, and the mean
    size in micro units — the dimensional-cardinality profile.

    Scale shape: per-batch distinct (type, brand, size) triples + counts —
    bounded by the dimension grid — fold on the driver; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_type", "p_brand", "p_size"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "p_type": np.asarray(t["p_type"].to_numpy(zero_copy_only=False)),
                "p_brand": np.asarray(t["p_brand"].to_numpy(zero_copy_only=False)),
                "p_size": t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = (
            df.groupby(["p_type", "p_brand", "p_size"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g.astype({"p_size": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "p_type": pd.Series([], dtype=object),
            "n_parts": pd.Series([], dtype=np.int64),
            "n_brands": pd.Series([], dtype=np.int64),
            "n_sizes": pd.Series([], dtype=np.int64),
            "avg_size_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = (
        part.groupby(["p_type", "p_brand", "p_size"], sort=False)["n"]
        .sum()
        .reset_index()
    )
    grid["sz_n"] = grid["p_size"] * grid["n"]
    out = (
        grid.groupby("p_type", sort=True)
        .agg(
            n_parts=("n", "sum"),
            n_brands=("p_brand", "nunique"),
            n_sizes=("p_size", "nunique"),
            sz=("sz_n", "sum"),
        )
        .reset_index()
    )
    out["avg_size_micro"] = np.floor(
        out["sz"].to_numpy(np.float64)
        / out["n_parts"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.drop(columns=["sz"]).astype(
        {"n_parts": np.int64, "n_brands": np.int64, "n_sizes": np.int64}
    )


ORACLES169["part_dimension_census"] = """
SELECT p_type,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands,
       CAST(count(DISTINCT p_size) AS BIGINT) AS n_sizes,
       CAST(floor(CAST(sum(CAST(p_size AS BIGINT)) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS avg_size_micro
FROM part GROUP BY 1"""


QUERIES169 = {
    "orders_yearly_whales": q_orders_yearly_whales,
    "part_dimension_census": q_part_dimension_census,
}
