"""Driver-contract queries, wave 10 — skew-aware join (hot keys broadcast,
cold keys shuffle), dense day-of-week pivot matrix, and deterministic negative
sampling for contrastive training. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import pyarrow as pa  # noqa: F401
import ray.data

ORACLES10: dict[str, str] = {}


def _fnv32_sql(expr: str) -> str:
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        f"list_transform(string_split(CAST({expr} AS VARCHAR), ''), "
        "c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
    )


# ---------------------------------------------------------------------------
# events_skew_join — hot probe keys broadcast, cold keys hash-shuffle
# ---------------------------------------------------------------------------


def q_events_skew_join(sf_dir: str):
    """Skew-aware events ⋈ customer (stages/asof.py::skew_join — per-batch
    top-k count combiner finds the hot users, their customer rows broadcast
    via ray.put and join shuffle-free; everyone else takes the ordinary
    hash-partitioned Dataset.join; result rows identical to a plain join)."""
    import numpy as np

    def with_key(t: pa.Table) -> pa.Table:
        jk = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "jk": pa.array(jk, pa.int64()),
            }
        )

    from ..stages.asof import skew_join

    probe = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    ).map_batches(with_key, batch_format="pyarrow")
    build = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return skew_join(
        probe, build, probe_key="jk", build_key="c_custkey",
        build_cols=["c_name"], hot_k=8,
    )


ORACLES10["events_skew_join"] = """
SELECT e.event_id, e.user_id, e.user_id + 1 AS jk, c.c_name
FROM events e JOIN customer c ON e.user_id + 1 = c.c_custkey"""


# ---------------------------------------------------------------------------
# events_pivot_dow — dense key × day-of-week count matrix
# ---------------------------------------------------------------------------


def q_events_pivot_dow(sf_dir: str):
    """Fixed-schema pivot (analytics.py::pivot_dow_counts — (key,dow) count
    combiner → tiny partial shuffle → per-key vectorized pivot)."""
    from ..stages.analytics import pivot_dow_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    return pivot_dow_counts(ds)


ORACLES10["events_pivot_dow"] = "SELECT event_type, " + ", ".join(
    f"CAST(count(*) FILTER (WHERE dayofweek(ts) = {d}) AS BIGINT) AS dow_{d}"
    for d in range(7)
) + " FROM events GROUP BY event_type"


# ---------------------------------------------------------------------------
# docs_negative_samples — k deterministic negatives per doc, shuffle-free
# ---------------------------------------------------------------------------

_NEG_K = 4


def q_docs_negative_samples(sf_dir: str):
    """Contrastive negative sampling (resample.py::negative_samples —
    stateless hash expansion over the dense id range; the only global state
    is the corpus count, one int)."""
    from ..stages.resample import negative_samples

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return negative_samples(ds, n_docs=ds.count(), k=_NEG_K)


ORACLES10["docs_negative_samples"] = f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT doc_id, j,
         {_fnv32_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
           % nn.n AS h,
         nn.n AS n
  FROM documents CROSS JOIN nn
  CROSS JOIN (SELECT unnest(range(0, {_NEG_K})) AS j) js
)
SELECT doc_id, j AS neg_idx,
       CASE WHEN h = doc_id THEN (h + 1) % n ELSE h END AS neg_id
FROM raw"""


QUERIES10 = {
    "events_skew_join": q_events_skew_join,
    "events_pivot_dow": q_events_pivot_dow,
    "docs_negative_samples": q_docs_negative_samples,
}
