"""Driver-contract queries, wave 148 — partitioner balance audit (the engine
auditing its OWN hash partitioning: per-bucket document counts under the
fnv1a32 64-way split every bucketed exchange in this repo relies on) and raw
byte metering per event type (the ingest-side usage accounting companion to
the routed-path usage_bytes). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES148: dict[str, str] = {}

# fnv1a32(s) % 64 — byte-exact vs functions/hashing.py for ASCII input
# (the queries.py _FNV_SHARD building block at modulus 64).
_FNV64_SQL = (
    "CAST(list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split({col}, ''), c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 64 AS BIGINT)"
)


# ---------------------------------------------------------------------------
# docs_partition_balance — per-bucket counts under the repo's own hash split
# ---------------------------------------------------------------------------


def q_docs_partition_balance(sf_dir: str):
    """For each of the 64 fnv1a32(doc_id-as-string) buckets this engine's
    exchanges use: the document count and its deviation from the uniform
    share in micro units (floor-half-up of n·64/total − 1, signed) — the
    partitioner-quality audit run before committing a key to a shuffle.
    Empty buckets are absent on both engines.

    Scale shape: per-batch (bucket, n) combiner over the bounded 64-bucket
    grid; driver fold; no shuffle — the audit never moves the data it
    audits."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = pc.cast(t["doc_id"], pa.string())
        b = (fnv1a32_arrow(ids.combine_chunks()) % 64).astype(np.int64)
        g = (
            pd.DataFrame({"bucket": b, "n": 1})
            .groupby("bucket", sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int64),
            "n_docs": pd.Series([], dtype=np.int64),
            "dev_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = part.groupby("bucket", sort=True)["n"].sum().reset_index(name="n_docs")
    total = float(out["n_docs"].sum())
    out["dev_micro"] = np.floor(
        (out["n_docs"].to_numpy(np.float64) * 64.0 / total - 1.0) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"bucket": np.int64, "n_docs": np.int64})


ORACLES148["docs_partition_balance"] = f"""
WITH b AS (
  SELECT {_FNV64_SQL.format(col="CAST(doc_id AS VARCHAR)")} AS bucket
  FROM documents
),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs FROM b GROUP BY 1)
SELECT bucket, n_docs,
       CAST(floor((CAST(n_docs AS DOUBLE) * 64.0
                   / CAST((SELECT sum(n_docs) FROM g) AS DOUBLE) - 1.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS dev_micro
FROM g"""


# ---------------------------------------------------------------------------
# events_bytes_by_type — raw ingest byte metering per event type
# ---------------------------------------------------------------------------


def q_events_bytes_by_type(sf_dir: str):
    """Per event type: row count, total UTF-8 payload bytes (props JSON +
    the type tag itself — the reference's usage meter counts serialized
    bytes, stages/export.py:86), average bytes per event in micro units,
    and share of total bytes in micro units.

    Scale shape: per-batch (type, n, bytes) combiner over the bounded type
    grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        nbytes = (
            pc.binary_length(t["props"]).to_numpy(zero_copy_only=False)
            + pc.binary_length(t["event_type"]).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                    "bytes": nbytes,
                }
            )
            .groupby("event_type", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "bytes": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype=np.int64),
            "sum_bytes": pd.Series([], dtype=np.int64),
            "avg_bytes_micro": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("event_type", sort=True)
        .agg(n_events=("n", "sum"), sum_bytes=("bytes", "sum"))
        .reset_index()
    )
    total = float(out["sum_bytes"].sum())
    out["avg_bytes_micro"] = np.floor(
        out["sum_bytes"].to_numpy(np.float64)
        / out["n_events"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    out["share_micro"] = np.floor(
        out["sum_bytes"].to_numpy(np.float64) / total * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({"n_events": np.int64, "sum_bytes": np.int64})


ORACLES148["events_bytes_by_type"] = """
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(octet_length(CAST(props AS BLOB))
                  + octet_length(CAST(event_type AS BLOB))) AS BIGINT)
           AS sum_bytes
  FROM events GROUP BY 1
)
SELECT event_type, n_events, sum_bytes,
       CAST(floor(CAST(sum_bytes AS DOUBLE) / CAST(n_events AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_bytes_micro,
       CAST(floor(CAST(sum_bytes AS DOUBLE)
                  / CAST((SELECT sum(sum_bytes) FROM g) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM g"""


QUERIES148 = {
    "docs_partition_balance": q_docs_partition_balance,
    "events_bytes_by_type": q_events_bytes_by_type,
}
