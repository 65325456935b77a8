"""Driver-contract queries, wave 18 — exact distributed moments (the
mean/variance profile every feature pipeline wants, with order-independent
integer sums) and referential-integrity checking across tables (the
foreign-key orphan scan of the data-quality family). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES18: dict[str, str] = {}

_RI_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_moments — exact per-group mean/variance via integer moment sums
# ---------------------------------------------------------------------------


def q_events_moments(sf_dir: str):
    """Distributed moments per event_type: n, Σcents, Σcents² accumulate as
    EXACT int64 (order-independent — the float-sum nondeterminism that makes
    naive distributed variance unhashable is gone), then mean/population
    variance derive with float ops mirroring the SQL expression order
    bit-for-bit. Per-batch Arrow group_by combiner → a |event_types|-row
    aggregate. (Σcents² reaches int64 limits around 10^15 rows per group;
    the upgrade path is a second 2^63-modulus limb — DuckDB's side is already
    HUGEINT-exact.)"""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        c = np.round(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "pn": np.ones(len(c), dtype=np.int64),
                "s": c,
                "ss": c * c,
            }
        )
        out = (
            df.groupby("event_type", sort=False)[["pn", "s", "ss"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("event_type").aggregate(
        Sum("pn", alias_name="n"),
        Sum("s", alias_name="sum_cents"),
        Sum("ss", alias_name="sumsq_cents"),
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        s = t["sum_cents"].to_numpy().astype(np.float64)
        ss = t["sumsq_cents"].to_numpy().astype(np.float64)
        mean_cents = s / n
        var_cents = ss / n - (s / n) * (s / n)
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"],
                "sum_cents": t["sum_cents"],
                "sumsq_cents": t["sumsq_cents"],
                "mean_cents": mean_cents,
                "var_cents": var_cents,
            }
        )

    return agg.map_batches(derive, batch_format="pyarrow")


ORACLES18["events_moments"] = """
WITH m AS (
  SELECT event_type, count(*) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(SUM(CAST(round(value * 100) AS BIGINT) *
                  CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sumsq_cents
  FROM events GROUP BY event_type)
SELECT event_type, n, sum_cents, sumsq_cents,
       CAST(sum_cents AS DOUBLE) / n AS mean_cents,
       CAST(sumsq_cents AS DOUBLE) / n -
         (CAST(sum_cents AS DOUBLE) / n) * (CAST(sum_cents AS DOUBLE) / n)
         AS var_cents
FROM m"""


# ---------------------------------------------------------------------------
# ref_integrity — foreign-key orphan scan across the relational tables
# ---------------------------------------------------------------------------

_RI_CHECKS = (
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
)


def _orphan_keys(sf_dir: str, child: str, ckey: str, parent: str, pkey: str) -> int:
    """Distinct child keys absent from the parent: both sides pre-dedup per
    batch, ship ONLY (key, side) through one bounded hash-bucket exchange
    (every occurrence of a key lands in one bucket), np.isin per bucket.
    Bloom pre-pruning (stages/asof.py::bloom_semijoin) would cut the child
    stream further; the exact path is the contract here."""

    def tag(side: int, col: str):
        def f(t: pa.Table) -> pa.Table:
            u = np.unique(t[col].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "_b": pa.array(
                        (u.astype(np.uint64) % _RI_BUCKETS).astype(np.int32)
                    ),
                    "k": pa.array(u),
                    "side": pa.array(
                        np.full(len(u), side, dtype=np.int8)
                    ),
                }
            )

        return f

    cds = ray.data.read_parquet(
        f"{sf_dir}/{child}.parquet", columns=[ckey]
    ).map_batches(tag(0, ckey), batch_format="pyarrow")
    pds = ray.data.read_parquet(
        f"{sf_dir}/{parent}.parquet", columns=[pkey]
    ).map_batches(tag(1, pkey), batch_format="pyarrow")

    def count_orphans(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        k = g["k"].to_numpy()
        child_keys = np.unique(k[side == 0])
        parent_keys = np.unique(k[side == 1])
        miss = np.int64((~np.isin(child_keys, parent_keys)).sum())
        return pd.DataFrame({"o": [miss]})

    out = (
        cds.union(pds)
        .groupby("_b")
        .map_groups(count_orphans, batch_format="pandas")
        .to_pandas()
    )
    return int(out["o"].sum())


def q_ref_integrity(sf_dir: str):
    """Referential-integrity validation (the cross-table member of the
    data-quality family): count distinct foreign-key values with no parent
    row, for the three relational edges of the schema. One bounded key-bucket
    exchange per check; driver residue = one scalar per check."""
    rows = [
        (name, _orphan_keys(sf_dir, c, ck, p, pk))
        for name, c, ck, p, pk in _RI_CHECKS
    ]
    return pd.DataFrame(
        {
            "check_name": [r[0] for r in rows],
            "orphan_keys": np.array([r[1] for r in rows], dtype=np.int64),
            "passed": np.array([r[1] == 0 for r in rows], dtype=bool),
        }
    )


ORACLES18["ref_integrity"] = """
SELECT 'orders_customer' AS check_name,
       CAST((SELECT count(*) FROM (SELECT DISTINCT o_custkey AS k FROM orders) c
             WHERE c.k NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
         AS orphan_keys,
       (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS k FROM orders) c
        WHERE c.k NOT IN (SELECT c_custkey FROM customer)) = 0 AS passed
UNION ALL
SELECT 'lineitem_orders',
       CAST((SELECT count(*) FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem) c
             WHERE c.k NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
       (SELECT count(*) FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem) c
        WHERE c.k NOT IN (SELECT o_orderkey FROM orders)) = 0
UNION ALL
SELECT 'lineitem_part',
       CAST((SELECT count(*) FROM (SELECT DISTINCT l_partkey AS k FROM lineitem) c
             WHERE c.k NOT IN (SELECT p_partkey FROM part)) AS BIGINT),
       (SELECT count(*) FROM (SELECT DISTINCT l_partkey AS k FROM lineitem) c
        WHERE c.k NOT IN (SELECT p_partkey FROM part)) = 0"""


QUERIES18 = {
    "events_moments": q_events_moments,
    "ref_integrity": q_ref_integrity,
}
