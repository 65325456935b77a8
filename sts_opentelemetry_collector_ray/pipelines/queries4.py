"""Driver-contract queries, wave 4 — round-3 additions beyond the queries3 set:
concat-and-chunk sequence packing, temperature resampling, funnel analysis, and
metric-attribute cardinality capping. Same contract as queries.py: each entry
returns a Dataset/table whose column names AND dtypes match its DuckDB oracle
exactly (the strict sweep compares dtypes, the driver hashes values)."""

from __future__ import annotations

import numpy as np  # noqa: F401  (kept for parity with sibling query modules)
import pyarrow as pa  # noqa: F401
import ray.data

from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL
from .queries3 import _FNV32_DOC

ORACLES4: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_seq_chunks — GPT-style concat-and-chunk sequence packing
# ---------------------------------------------------------------------------

_SEQ_LEN = 256


def q_docs_seq_chunks(sf_dir: str):
    """Fixed-length training-sequence layout: the corpus token stream in doc_id
    order cut into 256-token sequences that cross document boundaries
    (stages/pack.py::chunk_token_stream — two streaming passes, per-bucket
    token totals prefix-summed on the driver, broadcast offsets)."""
    from ..stages.pack import chunk_token_stream

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_token_stream(ds, seq_len=_SEQ_LEN)


ORACLES4["docs_seq_chunks"] = f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n
  FROM documents
),
o AS (
  SELECT doc_id, n,
         CAST(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) - n AS st
  FROM s
)
SELECT doc_id, n AS n_tokens, st AS tok_start,
       st // {_SEQ_LEN} AS seq_start,
       (st + n - 1) // {_SEQ_LEN} AS seq_end,
       (st + n - 1) // {_SEQ_LEN} - st // {_SEQ_LEN} + 1 AS n_seqs
FROM o"""


# ---------------------------------------------------------------------------
# docs_temperature_resample — UNIMAX-style language rebalancing
# ---------------------------------------------------------------------------

_RESAMPLE_ALPHA = 0.5


def q_docs_temperature_resample(sf_dir: str):
    """Temperature (alpha=0.5) resampling of the language mix: per-doc integer
    copy counts from the observed per-language distribution, fractional parts
    resolved by id hash (stages/resample.py — |langs|-row driver aggregate,
    then one shuffle-free np.repeat expansion per batch)."""
    from ..stages.resample import temperature_resample

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return temperature_resample(ds, alpha=_RESAMPLE_ALPHA)


_FNV32_DOC_1M = _FNV32_DOC.replace("% 100", "% 1000000")


def _temperature_oracle(sf_dir: str) -> str:
    """Replay with the engine's own policy constants inlined: the per-language
    (base, extra-millionths) integers come from the same `temperature_repeats`
    the distributed stage broadcasts, so the SQL checks the distributed
    expansion end-to-end without re-deriving driver float math in SQL."""
    import duckdb

    from ..stages.resample import temperature_repeats

    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT lang, count(*) FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY 1"
        ).fetchall()
    )
    reps = temperature_repeats(counts, _RESAMPLE_ALPHA)
    base_case = " ".join(f"WHEN '{l}' THEN {b}" for l, (b, _) in sorted(reps.items()))
    extra_case = " ".join(f"WHEN '{l}' THEN {e}" for l, (_, e) in sorted(reps.items()))
    return f"""
WITH r AS (
  SELECT doc_id, lang,
         CASE lang {base_case} ELSE 0 END
         + CASE WHEN {_FNV32_DOC_1M} < CASE lang {extra_case} ELSE 0 END
                THEN 1 ELSE 0 END AS n
  FROM documents
)
SELECT doc_id, lang, CAST(unnest(range(n)) AS BIGINT) AS repeat_idx
FROM r WHERE n > 0"""


# ---------------------------------------------------------------------------
# events_funnel — ordered funnel over the events stream
# ---------------------------------------------------------------------------


def q_events_funnel(sf_dir: str):
    """view → click → purchase funnel per user, earliest strict-ordered chain
    (stages/clusters.py::funnel — one bounded user-bucket exchange, per-step
    vectorized min scans)."""
    from ..stages.clusters import funnel

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    return funnel(ds)


ORACLES4["events_funnel"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
)
SELECT s1.user_id,
       CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS steps_completed,
       epoch_us(s1.t1) AS ts_first_us,
       epoch_us(coalesce(s3.t3, s2.t2, s1.t1)) AS ts_last_us
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id"""


# ---------------------------------------------------------------------------
# metrics_cardinality_cap — bounded metric-attribute cardinality
# ---------------------------------------------------------------------------

_CAP_K = 50


def q_metrics_cardinality_cap(sf_dir: str):
    """Per-role conversation-series counts with cardinality capped at K=50:
    top-K attrs by count (ties attr asc) keep their series, the tail folds into
    '__overflow__' (stages/aggregate.py::cardinality_cap — combiner counts,
    bounded partial-top-k keep set, broadcast remap)."""
    from ..sources import derive_transcripts_from_events
    from ..stages.aggregate import cardinality_cap

    ds = derive_transcripts_from_events(sf_dir)
    return cardinality_cap(ds, metric_col="role", attr_col="conv_id", k=_CAP_K)


ORACLES4["metrics_cardinality_cap"] = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + f""",
c AS (
  SELECT role, conv_id, CAST(count(*) AS BIGINT) AS n
  FROM transcripts GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY role ORDER BY n DESC, conv_id) AS rn
  FROM c
),
m AS (
  SELECT role,
         CASE WHEN rn <= {_CAP_K} THEN conv_id ELSE '__overflow__' END AS conv_id,
         n
  FROM r
)
SELECT role, conv_id, CAST(SUM(n) AS BIGINT) AS n FROM m GROUP BY 1, 2"""
)


def dynamic_oracles4() -> dict[str, str]:
    """Oracles whose SQL inlines constants derived from the input tables (same
    mechanism as queries3.dynamic_oracles)."""
    import os

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out: dict[str, str] = {}
    try:
        out["docs_temperature_resample"] = _temperature_oracle(sf_dir)
    except Exception:  # sf dir without documents: rows-only fallback
        pass
    return out


QUERIES4 = {
    "docs_seq_chunks": q_docs_seq_chunks,
    "docs_temperature_resample": q_docs_temperature_resample,
    "events_funnel": q_events_funnel,
    "metrics_cardinality_cap": q_metrics_cardinality_cap,
}
