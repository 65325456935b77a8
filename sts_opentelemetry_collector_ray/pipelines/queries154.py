"""Driver-contract queries, wave 154 — volume-discount audit (average
discount by quantity bucket: is the pricing policy actually monotone in
volume?) and region→nation revenue rollup (two-level hierarchical shares —
the drill-down table a BI layer materializes). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES154: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_volume_discount — average discount per quantity value
# ---------------------------------------------------------------------------


def q_lineitem_volume_discount(sf_dir: str):
    """Per integer quantity (floor-half-up): line count, exact summed
    discount in milli units, and the average discount in micro units —
    the volume-discount policy curve.

    Scale shape: per-batch (qty, n, milli) combiner over the bounded
    quantity grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        qty = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        milli = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"quantity": qty, "n": 1, "milli": milli})
            .groupby("quantity", sort=False, as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "quantity": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "sum_discount_milli": pd.Series([], dtype=np.int64),
            "avg_discount_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("quantity", sort=True)
        .agg(n_lines=("n", "sum"), sum_discount_milli=("milli", "sum"))
        .reset_index()
    )
    out["avg_discount_micro"] = np.floor(
        out["sum_discount_milli"].to_numpy(np.float64)
        / out["n_lines"].to_numpy(np.float64)
        * 1_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


ORACLES154["lineitem_volume_discount"] = """
WITH g AS (
  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS quantity,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_discount_milli
  FROM lineitem GROUP BY 1
)
SELECT quantity, n_lines, sum_discount_milli,
       CAST(floor(CAST(sum_discount_milli AS DOUBLE)
                  / CAST(n_lines AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)
         AS avg_discount_micro
FROM g"""


# ---------------------------------------------------------------------------
# region_revenue_rollup — two-level hierarchical revenue shares
# ---------------------------------------------------------------------------


def q_region_revenue_rollup(sf_dir: str):
    """Per (region, nation): order count, exact o_totalprice revenue cents,
    the nation's share WITHIN its region, and the region's share of the
    corpus — both in micro units. The drill-down rollup, hierarchy resolved
    with broadcast dimensions.

    Scale shape: orders ⋈ customer (Dataset hash join), nation→region map
    broadcast via ``ray.put`` (25+5 rows — never a shuffle side); per-batch
    (region, nation) cents combiner over the bounded grid; driver fold."""
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq_mod.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    nk = nat["n_nationkey"].to_numpy()
    order = np.argsort(nk)
    rmap = dict(
        zip(
            reg["r_regionkey"].to_numpy().tolist(),
            reg["r_name"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    rnames = np.array(
        [rmap[k] for k in nat["n_regionkey"].to_numpy()[order]], dtype=object
    )
    ref = ray.put(
        (
            nk[order],
            nat["n_name"].to_numpy(zero_copy_only=False)[order],
            rnames,
        )
    )

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j = o.join(
        c,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        keys, nnames, rnames_b = ray.get(ref)
        idx = np.searchsorted(keys, t["c_nationkey"].to_numpy(zero_copy_only=False))
        idx = np.minimum(idx, len(keys) - 1)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "r_name": rnames_b[idx],
                    "n_name": np.asarray(nnames)[idx],
                    "n": 1,
                    "cents": cents,
                }
            )
            .groupby(["r_name", "n_name"], sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "cents": np.int64})

    part = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "r_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "n_orders": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "nation_in_region_micro": pd.Series([], dtype=np.int64),
            "region_share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "r_name" not in part.columns:
        return empty
    out = (
        part.groupby(["r_name", "n_name"], sort=True)
        .agg(n_orders=("n", "sum"), sum_cents=("cents", "sum"))
        .reset_index()
    )
    region_tot = out.groupby("r_name")["sum_cents"].transform("sum")
    total = float(out["sum_cents"].sum())
    out["nation_in_region_micro"] = np.floor(
        out["sum_cents"].to_numpy(np.float64)
        / region_tot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    out["region_share_micro"] = np.floor(
        region_tot.to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"n_orders": np.int64, "sum_cents": np.int64})


ORACLES154["region_revenue_rollup"] = """
WITH g AS (
  SELECT r.r_name, n.n_name,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
rt AS (SELECT r_name, CAST(sum(sum_cents) AS BIGINT) AS region_tot FROM g GROUP BY 1)
SELECT g.r_name, g.n_name, g.n_orders, g.sum_cents,
       CAST(floor(CAST(g.sum_cents AS DOUBLE) / CAST(rt.region_tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS nation_in_region_micro,
       CAST(floor(CAST(rt.region_tot AS DOUBLE)
                  / CAST((SELECT sum(sum_cents) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS region_share_micro
FROM g JOIN rt USING (r_name)"""


QUERIES154 = {
    "lineitem_volume_discount": q_lineitem_volume_discount,
    "region_revenue_rollup": q_region_revenue_rollup,
}
