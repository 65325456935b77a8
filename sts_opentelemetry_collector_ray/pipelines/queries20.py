"""Driver-contract queries, wave 20 — star-schema flattening (fact stream ⋈
hash-joined mid dim ⋈ broadcast tiny dims) and incremental view maintenance
(base + delta partial-aggregate merge ≡ full recompute). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES20: dict[str, str] = {}


# ---------------------------------------------------------------------------
# star_flatten — orders ⋈ customer ⋈ nation ⋈ region → per-region revenue
# ---------------------------------------------------------------------------


def q_star_flatten(sf_dir: str):
    """Star-schema flatten: the fact stream joins the one non-tiny dimension
    (customer) with Ray's hash-partitioned `Dataset.join`, while the tiny
    dimensions (nation, region — O(10²) rows at ANY corpus scale) broadcast
    once via `ray.put` and resolve inside a single map_batches with
    `pc.index_in` + take — never a shuffle for the small sides (ST4/J3
    pattern). Revenue sums as exact integer cents; the final aggregate sees
    |regions|×|nations| partials."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    nation = pa.concat_tables(
        [
            b
            for b in ray.data.read_parquet(
                f"{sf_dir}/nation.parquet",
                columns=["n_nationkey", "n_name", "n_regionkey"],
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
    )
    region = pa.concat_tables(
        [
            b
            for b in ray.data.read_parquet(
                f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ]
    )
    dims_ref = ray.put(
        {
            "nk": nation["n_nationkey"].combine_chunks(),
            "nname": nation["n_name"].combine_chunks(),
            "nrk": nation["n_regionkey"].combine_chunks(),
            "rk": region["r_regionkey"].combine_chunks(),
            "rname": region["r_name"].combine_chunks(),
        }
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=16,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def resolve(t: pa.Table) -> pa.Table:
        d = ray.get(dims_ref)
        ni = pc.index_in(t["c_nationkey"], value_set=d["nk"])
        nname = d["nname"].take(ni)
        nrk = d["nrk"].take(ni)
        ri = pc.index_in(nrk, value_set=d["rk"])
        rname = d["rname"].take(ri)
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        g = (
            pa.table({"r_name": rname, "n_name": nname, "c": cents})
            .group_by(["r_name", "n_name"])
            .aggregate([("c", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["r_name", "n_name", "pc_", "pn"])

    partials = joined.map_batches(resolve, batch_format="pyarrow")
    return partials.groupby(["r_name", "n_name"]).aggregate(
        Sum("pc_", alias_name="revenue_cents"), Sum("pn", alias_name="n_orders")
    )


ORACLES20["star_flatten"] = """
SELECT r_name, n_name,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name"""


# ---------------------------------------------------------------------------
# events_ivm_merge — incremental view maintenance: base ⊕ delta ≡ recompute
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "2024-01-15"


def q_events_ivm_merge(sf_dir: str):
    """Incremental view maintenance: the (event_type → n, sum_cents) view is
    materialized from the BASE partition (ts < cutoff), the DELTA partition
    (ts ≥ cutoff) aggregates separately, and the two partial views MERGE by
    re-summing — never touching base rows again. Both reads push the ts
    predicate into the parquet scan (row-group pruning via `filter=`), and
    the merge input is 2×|types| rows, so refreshing the view costs only the
    delta scan at any corpus size. Result provably equals the full recompute
    (the oracle IS the full recompute)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    cut = pd.Timestamp(_IVM_CUTOFF).to_datetime64()

    def partial(t: pa.Table) -> pa.Table:
        c = np.round(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "pn": np.ones(len(c), dtype=np.int64),
                "s": c,
            }
        )
        out = df.groupby("event_type", sort=False)[["pn", "s"]].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def view_of(flt) -> "ray.data.Dataset":
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "ts", "value"],
            filter=flt,
        ).map_batches(partial, batch_format="pyarrow")

    base = view_of(pads.field("ts") < cut)
    delta = view_of(pads.field("ts") >= cut)
    merged = base.union(delta)
    return merged.groupby("event_type").aggregate(
        Sum("pn", alias_name="n"), Sum("s", alias_name="sum_cents")
    )


ORACLES20["events_ivm_merge"] = """
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type"""


QUERIES20 = {
    "star_flatten": q_star_flatten,
    "events_ivm_merge": q_events_ivm_merge,
}
