"""Driver-contract queries, wave 57 — synchronous label-propagation
communities over the customer↔supplier interaction graph (the community step
between components and modularity methods) and the Theil–Sen robust trend of
daily revenue (the slope estimate outliers can't drag). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES57: dict[str, str] = {}

_LPA_ROUNDS = 3


# ---------------------------------------------------------------------------
# graph_lpa_communities — synchronous mode-of-neighbors label propagation
# ---------------------------------------------------------------------------


def q_graph_lpa_communities(sf_dir: str):
    """3-round synchronous LPA (stages/graph.py::label_propagation_sync) on
    the symmetrized customer↔supplier graph of orders ⋈ lineitem. Node ids
    disambiguate the two key spaces: customer c → 2c, supplier s → 2s+1.
    Deterministic by construction (synchronous rounds, ties → smallest
    label), so a chained-CTE oracle replays it exactly."""
    from ray.data.aggregate import Count

    from ..stages.graph import label_propagation_sync

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    l = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    pairs = (
        l.join(o, join_type="inner", num_partitions=8,
               on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby(["o_custkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )

    def symmetrize(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s])),
                "dst": pa.array(np.concatenate([s, c])),
            }
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    return label_propagation_sync(edges, rounds=_LPA_ROUNDS)


def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    steps = []
    prev = "l0"
    for r in range(1, rounds + 1):
        steps.append(
            f"""cnt{r} AS (
  SELECT e.dst AS node, l.lab, count(*) AS c
  FROM e JOIN {prev} l ON l.node = e.src GROUP BY 1, 2
),
pick{r} AS (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS r
    FROM cnt{r}
  ) WHERE r = 1
),
l{r} AS (
  SELECT l.node, coalesce(p.lab, l.lab) AS lab
  FROM {prev} l LEFT JOIN pick{r} p USING (node)
)"""
        )
        prev = f"l{r}"
    chained = ",\n".join(steps)
    return f"""
WITH p AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (
  SELECT 2 * c AS src, 2 * s + 1 AS dst FROM p
  UNION ALL
  SELECT 2 * s + 1, 2 * c FROM p
),
l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
{chained}
SELECT node, CAST(lab AS BIGINT) AS community FROM {prev}"""


ORACLES57["graph_lpa_communities"] = _lpa_oracle()


# ---------------------------------------------------------------------------
# orders_theilsen_trend — robust slope of daily revenue (median of slopes)
# ---------------------------------------------------------------------------


def q_orders_theilsen_trend(sf_dir: str):
    """Theil–Sen trend of daily order revenue: the LOWER median (rank
    ⌈m/2⌉) of all pairwise slopes (revⱼ−revᵢ)/(dayⱼ−dayᵢ), i<j — the robust
    regression slope a 30%-outlier day cannot move. Each slope is ONE float
    division of exact integers, and the median picks a single element, so
    there is no float-accumulation hazard.

    Scale shape: per-batch (day, cents) partials → ONE tiny exchange bounded
    by the calendar-day domain → pairwise slopes over that bounded series on
    the driver (m = O(days²) scalars, corpus-independent)."""

    def partial(t: pa.Table) -> pa.Table:
        days = (
            pa.compute.cast(t["o_orderdate"], pa.int64()).to_numpy()
            // 86_400_000_000
        )
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"day": days, "cents": cents})
        g = df.groupby("day", sort=False)["cents"].sum().reset_index()
        g["cents"] = g["cents"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    daily = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: calendar-day domain
        .groupby("day")["cents"]
        .sum()
        .sort_index()
    )
    d = daily.index.to_numpy(np.int64)
    y = daily.to_numpy(np.int64)
    n = len(d)
    di, dj = np.triu_indices(n, k=1)
    slopes = (y[dj] - y[di]).astype(np.float64) / (d[dj] - d[di]).astype(np.float64)
    m = len(slopes)
    slopes.sort()
    med = float(slopes[(m + 1) // 2 - 1]) if m else 0.0
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "n_pairs": [np.int64(m)],
            "slope_micro": [np.int64(np.floor(med * 1e6 + 0.5))],
        }
    )


ORACLES57["orders_theilsen_trend"] = """
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
s AS (
  SELECT (b.cents - a.cents) * 1.0 / (b.day - a.day) AS slope
  FROM daily a JOIN daily b ON a.day < b.day
),
r AS (
  SELECT slope, row_number() OVER (ORDER BY slope) AS rn, count(*) OVER () AS m
  FROM s
)
SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
       CAST(any_value(m) AS BIGINT) AS n_pairs,
       CAST(floor(any_value(slope) * 1000000 + 0.5) AS BIGINT) AS slope_micro
FROM r WHERE rn = (m + 1) // 2"""


QUERIES57 = {
    "graph_lpa_communities": q_graph_lpa_communities,
    "orders_theilsen_trend": q_orders_theilsen_trend,
}
