"""Driver-contract queries, wave 143 — order-size distribution (lines per
order histogram with revenue mass: the fact-table fan-out profile that sizes
join buffers) and line-position revenue profile (does revenue decay along
l_linenumber — the intra-order position bias). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES143: dict[str, str] = {}


# ---------------------------------------------------------------------------
# orders_linecount_profile — lines-per-order histogram with revenue mass
# ---------------------------------------------------------------------------


def q_orders_linecount_profile(sf_dir: str):
    """Histogram of order sizes: for each lines-per-order value, how many
    orders have exactly that many line items, their total revenue in exact
    extendedprice cents, and the average revenue per order in micro-cents
    (floor-half-up; ONE double division).

    Scale shape: per-batch (orderkey, n, cents) combiner, ONE orderkey-hash
    bucket exchange (an order's lines complete in one bucket), per-bucket
    vectorized re-reduce to the bounded (n_lines → n_orders, cents)
    histogram partials folded on the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "ok": t["l_orderkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "n": 1,
                    "cents": cents,
                }
            )
            .groupby("ok", sort=False, as_index=False)
            .sum()
        )
        g["_b"] = (g["ok"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"n": np.int64, "cents": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per_order = g.groupby("ok", sort=False, as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum")
        )
        hist = (
            per_order.groupby("n", sort=False)
            .agg(n_orders=("ok", "count"), sum_cents=("cents", "sum"))
            .reset_index()
            .rename(columns={"n": "n_lines"})
        )
        return hist.astype(
            {"n_lines": np.int64, "n_orders": np.int64, "sum_cents": np.int64}
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= max-lines-per-order rows per bucket
    )
    empty = pd.DataFrame(
        {
            "n_lines": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "avg_cents_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "n_lines" not in part.columns:
        return empty
    out = (
        part.groupby("n_lines", sort=True)
        .agg(n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum"))
        .reset_index()
    )
    out["avg_cents_micro"] = np.floor(
        out["sum_cents"].to_numpy(np.float64)
        / out["n_orders"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(
        {"n_lines": np.int64, "n_orders": np.int64, "sum_cents": np.int64}
    )


ORACLES143["orders_linecount_profile"] = """
WITH per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
)
SELECT n_lines,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(floor(CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_cents_micro
FROM per_order GROUP BY 1"""


# ---------------------------------------------------------------------------
# lineitem_linenumber_profile — revenue by intra-order line position
# ---------------------------------------------------------------------------


def q_lineitem_linenumber_profile(sf_dir: str):
    """Per l_linenumber (intra-order position): line count, exact revenue
    cents, revenue share of the whole corpus in micro units, and average
    quantity in milli units — the position-bias profile.

    Scale shape: per-batch (linenumber, n, cents, qty_milli) combiner over
    the bounded ≤7-position grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_linenumber", "l_extendedprice", "l_quantity"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        qmilli = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "l_linenumber": t["l_linenumber"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "n": 1,
                    "cents": cents,
                    "qm": qmilli,
                }
            )
            .groupby("l_linenumber", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "cents": np.int64, "qm": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "l_linenumber": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
            "avg_qty_milli": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("l_linenumber", sort=True)
        .agg(n_lines=("n", "sum"), sum_cents=("cents", "sum"), qm=("qm", "sum"))
        .reset_index()
    )
    total = float(out["sum_cents"].sum())
    out["share_micro"] = np.floor(
        out["sum_cents"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["avg_qty_milli"] = np.floor(
        out["qm"].to_numpy(np.float64) / out["n_lines"].to_numpy(np.float64) + 0.5
    ).astype(np.int64)
    return out.drop(columns=["qm"]).astype(
        {"l_linenumber": np.int64, "n_lines": np.int64, "sum_cents": np.int64}
    )


ORACLES143["lineitem_linenumber_profile"] = """
WITH g AS (
  SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_cents,
         CAST(sum(CAST(floor(l_quantity * 1000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS qm
  FROM lineitem GROUP BY 1
)
SELECT l_linenumber, n_lines, sum_cents,
       CAST(floor(CAST(sum_cents AS DOUBLE)
                  / CAST((SELECT sum(sum_cents) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro,
       CAST(floor(CAST(qm AS DOUBLE) / CAST(n_lines AS DOUBLE) + 0.5)
            AS BIGINT) AS avg_qty_milli
FROM g"""


QUERIES143 = {
    "orders_linecount_profile": q_orders_linecount_profile,
    "lineitem_linenumber_profile": q_lineitem_linenumber_profile,
}
