"""Driver-contract queries, wave 8 — TTL re-emit dedup (the reference's dedup
cache WITH expiry), integer PageRank (distributed iterative graph rank), and
exact grouped quantiles over a bounded value domain. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import pyarrow as pa  # noqa: F401
import ray.data

ORACLES8: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_ttl_dedup — greedy per-key TTL re-emission chain
# ---------------------------------------------------------------------------

_TTL_US = 2 * 86_400_000_000  # 2 days


def q_events_ttl_dedup(sf_dir: str):
    """TTL dedup with re-emission (stages/ttl.py::ttl_dedup — one bounded
    key-bucket exchange + vectorized searchsorted round loop; the reference's
    usage-dedup cache semantics including expiry, not just first-wins)."""
    from ..stages.ttl import ttl_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return ttl_dedup(
        ds, key_cols=["user_id", "event_type"], ts_col="ts",
        id_col="event_id", ttl_us=_TTL_US,
    )


ORACLES8["events_ttl_dedup"] = """
WITH RECURSIVE em AS (
  SELECT user_id, event_type, ts, event_id FROM (
    SELECT user_id, event_type, ts, event_id,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rn
    FROM events) WHERE rn = 1
  UNION ALL
  SELECT user_id, event_type, ts, event_id FROM (
    SELECT e.user_id, e.event_type, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id, e.event_type
                              ORDER BY e.ts, e.event_id) AS rn
    FROM em JOIN events e
      ON e.user_id = em.user_id AND e.event_type = em.event_type
     AND e.ts >= em.ts + INTERVAL 2 DAY
  ) WHERE rn = 1
)
SELECT user_id, event_type, ts, event_id FROM em"""


# ---------------------------------------------------------------------------
# graph_pagerank — 10-iteration integer PageRank on the customer→supplier graph
# ---------------------------------------------------------------------------


def q_graph_pagerank(sf_dir: str):
    """Integer PageRank (stages/graph.py::pagerank_integer) on the DISTINCT
    customer→supplier edges of orders ⋈ lineitem: edges bucket-materialized
    once, each iteration = two bounded bucket exchanges (scatter rank//deg,
    gather 85%-damped sums); exact int64 arithmetic end to end."""
    import pyarrow.compute as pc  # noqa: F401

    from ray.data.aggregate import Count

    from ..stages.graph import pagerank_integer

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    l = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    edges = (
        l.join(o, join_type="inner", num_partitions=8,
               on=("l_orderkey",), right_on=("o_orderkey",))
        .groupby(["o_custkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )
    return pagerank_integer(edges, src_col="o_custkey", dst_col="l_suppkey")


def _pagerank_oracle(iterations: int = 10) -> str:
    from ..stages.graph import TOTAL

    prev = "r0"
    its = []
    for k in range(1, iterations + 1):
        its.append(f"""
r{k} AS (
  SELECT n.node,
         ({TOTAL} * 15) // (100 * nn.n)
         + (85 * coalesce(s.m, 0)) // 100 AS r
  FROM nodes n CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS node, sum(p.r // e.deg) AS m
    FROM e JOIN {prev} p ON p.node = e.src
    GROUP BY e.dst) s ON s.node = n.node
)""")
        prev = f"r{k}"
    return f"""
WITH eraw AS (
  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM eraw GROUP BY src),
e AS (SELECT eraw.src, eraw.dst, deg.d AS deg FROM eraw JOIN deg USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM eraw UNION SELECT DISTINCT dst FROM eraw),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, {TOTAL} // nn.n AS r FROM nodes CROSS JOIN nn),
{",".join(its)}
SELECT node, CAST(r AS BIGINT) AS rank_int FROM {prev}"""


ORACLES8["graph_pagerank"] = _pagerank_oracle()


# ---------------------------------------------------------------------------
# events_quantiles_exact — exact per-type quantiles from a value histogram
# ---------------------------------------------------------------------------


def q_events_quantiles_exact(sf_dir: str):
    """EXACT p50/p90 per event_type without a global sort
    (quantiles.py::grouped_quantiles_exact — (key, cents) histogram combiner,
    bounded shuffle of distinct values, integer-rational rank pick)."""
    from ..stages.quantiles import grouped_quantiles_exact

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return grouped_quantiles_exact(ds, "value", "event_type")


ORACLES8["events_quantiles_exact"] = """
WITH b AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
  SELECT event_type, cents,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum
  FROM c
),
qs AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90')) q(num, den, q_label)),
pick AS (
  SELECT t.event_type, q.q_label, t.n, min(cum.cents) AS cents
  FROM t CROSS JOIN qs q
  JOIN cum ON cum.event_type = t.event_type
          AND cum.cum >= (t.n * q.num + q.den - 1) // q.den
  GROUP BY 1, 2, 3
)
SELECT event_type, q_label, n, cents / 100.0 AS value FROM pick"""


QUERIES8 = {
    "events_ttl_dedup": q_events_ttl_dedup,
    "graph_pagerank": q_graph_pagerank,
    "events_quantiles_exact": q_events_quantiles_exact,
}
