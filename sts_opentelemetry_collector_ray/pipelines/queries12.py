"""Driver-contract queries, wave 12 — bloom semi-join, exact grouped distinct
counts, changelog apply with delete tombstones, and vectorized JSON field
extraction. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa  # noqa: F401
import ray.data

ORACLES12: dict[str, str] = {}

_BSJ_CUT = "2000-01-01"


# ---------------------------------------------------------------------------
# orders_bloom_semijoin — orders having a lineitem shipped after the cutoff
# ---------------------------------------------------------------------------


def q_orders_bloom_semijoin(sf_dir: str):
    """Bloom semi-join (stages/asof.py::bloom_semijoin — right keys compress
    to one broadcast 64Kbit filter that pre-prunes the probe stream with zero
    false negatives; survivors take the exact join). Result identical to a
    plain semi-join."""
    import pyarrow.compute as pc  # noqa: F401

    from ..stages.asof import bloom_semijoin

    cut = np.datetime64(_BSJ_CUT, "us")
    probe = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    keys = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(
            pa.array(t["l_shipdate"].to_numpy(zero_copy_only=False) > cut)
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    return bloom_semijoin(probe, keys, probe_key="o_orderkey", right_key="l_orderkey")


ORACLES12["orders_bloom_semijoin"] = f"""
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     WHERE l_shipdate > TIMESTAMP '{_BSJ_CUT}')"""


# ---------------------------------------------------------------------------
# events_distinct_daily — exact distinct users per (type, day)
# ---------------------------------------------------------------------------


def q_events_distinct_daily(sf_dir: str):
    """Exact COUNT(DISTINCT) per group without shipping raw rows: per-batch
    distinct-(type, day, user) combiner → one global triple dedup → per-batch
    count partials → tiny (type, day) sum. The exchange carries distinct
    triples, never events."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    def triples(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        day_us = (ts.astype("datetime64[D]").astype(np.int64)) * 86_400_000_000
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "day_us": pa.array(day_us, pa.int64()),
                    "user_id": t["user_id"],
                }
            )
            .group_by(["event_type", "day_us", "user_id"])
            .aggregate([])
        )
        return g.replace_schema_metadata(None)

    def partial_counts(t: pa.Table) -> pa.Table:
        g = (
            t.select(["event_type", "day_us"])
            .group_by(["event_type", "day_us"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(
            ["event_type", "day_us", "p_n"]
        ).replace_schema_metadata(None)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id"]
    )
    dedup = (
        ds.map_batches(triples, batch_format="pyarrow")
        .groupby(["event_type", "day_us", "user_id"])
        .aggregate(Count(alias_name="_c"))
    )
    agg = (
        dedup.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["event_type", "day_us"])
        .aggregate(Sum("p_n", alias_name="n_users"))
    )
    return agg


ORACLES12["events_distinct_daily"] = """
SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# events_changelog_apply — last-wins upsert + delete tombstones
# ---------------------------------------------------------------------------


def q_events_changelog_apply(sf_dir: str):
    """CDC changelog apply: per user the LATEST event wins (compact.py::
    upsert_latest's bucketed last-wins), and a latest-event tombstone
    (event_type = 'error') deletes the key entirely — the reference's
    snapshot-swap removal semantics (rules/diff.py) on data keys."""
    import pyarrow.compute as pc

    from ..stages.compact import upsert_latest

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    latest = upsert_latest(ds, key_cols=("user_id",))

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["event_type"], "error"))
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"].cast(pa.timestamp("us")),
                "value": t["value"],
            }
        )

    return latest.map_batches(finish, batch_format="pyarrow")


ORACLES12["events_changelog_apply"] = """
SELECT user_id, event_id, ts, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'"""


# ---------------------------------------------------------------------------
# events_json_extract — vectorized fixed-schema JSON field extraction
# ---------------------------------------------------------------------------


def q_events_json_extract(sf_dir: str):
    """Typed field extraction from a JSON props column via ONE Arrow RE2
    kernel (extract_regex) — the vectorized path for fixed-schema props (no
    per-row json.loads; the parse_extract stage's pattern on raw JSON)."""
    import pyarrow.compute as pc

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            pc.fill_null(t["props"], ""), r'"k": (?P<v>[0-9]+)'
        )
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({"event_id": t["event_id"], "k_val": v})

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )
    return ds.map_batches(extract, batch_format="pyarrow")


ORACLES12["events_json_extract"] = """
SELECT event_id,
       TRY_CAST(nullif(regexp_extract(coalesce(props, ''), '"k": ([0-9]+)', 1), '')
                AS BIGINT) AS k_val
FROM events"""


QUERIES12 = {
    "orders_bloom_semijoin": q_orders_bloom_semijoin,
    "events_distinct_daily": q_events_distinct_daily,
    "events_changelog_apply": q_events_changelog_apply,
    "events_json_extract": q_events_json_extract,
}
