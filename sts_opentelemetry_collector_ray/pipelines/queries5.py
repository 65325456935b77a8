"""Driver-contract queries, wave 5 — mergeable sketches (HyperLogLog, Count-Min),
last-wins upsert compaction, ROLLUP aggregation, RAG overlap-chunking,
conversation reassembly, consecutive-token collapse, weighted Bernoulli
sampling, and a bounded inverted-index build. Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np  # noqa: F401
import pyarrow as pa  # noqa: F401
import ray.data

from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

ORACLES5: dict[str, str] = {}


def _fnv32_sql(expr: str) -> str:
    """FNV-1a32 of an expression's VARCHAR form, as exact BIGINT — the SQL
    replay of functions/hashing.py::fnv1a32_arrow (byte==codepoint holds for
    the ASCII keys these queries hash)."""
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        f"list_transform(string_split(CAST({expr} AS VARCHAR), ''), "
        "c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
    )


# ---------------------------------------------------------------------------
# events_upsert_latest — CDC-style last-wins compaction
# ---------------------------------------------------------------------------


def q_events_upsert_latest(sf_dir: str):
    """Latest row per (user_id, event_type) by (ts desc, event_id desc) —
    changelog compaction (stages/compact.py: per-batch last-wins combiner →
    one bounded key-bucket exchange → per-bucket final)."""
    import pyarrow.compute as pc

    from ..stages.compact import upsert_latest

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = upsert_latest(ds, ("user_id", "event_type"), "ts", "event_id")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
                "value": t["value"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


ORACLES5["events_upsert_latest"] = """
SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1"""


# ---------------------------------------------------------------------------
# events_rollup_hourly — multi-granularity cube in one pass
# ---------------------------------------------------------------------------


def q_events_rollup_hourly(sf_dir: str):
    """ROLLUP(event_type, hour): counts + exact integer-cent value sums at all
    three levels from ONE scan (stages/aggregate.py::rollup_hourly — finest
    combiner + tiny shuffle, coarser levels re-aggregated from the bounded
    finest result)."""
    from ..stages.aggregate import rollup_hourly

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return rollup_hourly(ds)


ORACLES5["events_rollup_hourly"] = """
WITH b AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) AS hour_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT CASE WHEN grouping(event_type) = 1 THEN '__all__' ELSE event_type END
         AS event_type,
       CASE WHEN grouping(hour_us) = 1 THEN -1 ELSE hour_us END AS hour_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM b GROUP BY ROLLUP(event_type, hour_us)"""


# ---------------------------------------------------------------------------
# docs_chunks_overlap — RAG retrieval chunking
# ---------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 64, 48


def q_docs_chunks_overlap(sf_dir: str):
    """Overlapping 64-word chunks every 48 words per document
    (stages/pack.py::chunk_overlap — one vectorized gather + join per batch,
    zero shuffles)."""
    from ..stages.pack import chunk_overlap

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_overlap(ds, window=_CHUNK_W, stride=_CHUNK_S)


ORACLES5["docs_chunks_overlap"] = f"""
WITH s AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n
  FROM documents
),
c AS (
  SELECT doc_id, w, n,
         CAST(unnest(range(1 + CASE WHEN n > {_CHUNK_W}
              THEN (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} ELSE 0 END))
           AS BIGINT) AS chunk_idx
  FROM s
)
SELECT doc_id, chunk_idx,
       least(chunk_idx * {_CHUNK_S} + {_CHUNK_W}, n) - chunk_idx * {_CHUNK_S}
         AS n_words,
       array_to_string(
         w[chunk_idx * {_CHUNK_S} + 1 : least(chunk_idx * {_CHUNK_S} + {_CHUNK_W}, n)],
         ' ') AS chunk_text
FROM c"""


# ---------------------------------------------------------------------------
# events_approx_distinct — HyperLogLog distinct users per event type
# ---------------------------------------------------------------------------


def q_events_approx_distinct(sf_dir: str):
    """HLL (p=6) approximate distinct user_ids per event_type
    (stages/sketches.py — per-batch register combiner, max-merge exchange of
    ≤ |types|·64 rows, integer-numerator estimator so the SQL replay is
    bit-exact)."""
    from ..stages.sketches import hll_distinct

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_distinct(ds, "event_type", "user_id")


_HV = _fnv32_sql("user_id")

ORACLES5["events_approx_distinct"] = f"""
WITH h0 AS (SELECT event_type, {_HV} AS hv FROM events),
-- murmur3 fmix32 finalizer, stage-for-stage (sketches.py::_fmix32)
h1 AS (SELECT event_type, xor(hv, hv >> 16) AS v FROM h0),
h2 AS (SELECT event_type,
              CAST((v::HUGEINT * 2246822507) % 4294967296 AS BIGINT) AS v
       FROM h1),
h3 AS (SELECT event_type, xor(v, v >> 13) AS v FROM h2),
h4 AS (SELECT event_type,
              CAST((v::HUGEINT * 3266489909) % 4294967296 AS BIGINT) AS v
       FROM h3),
h AS (SELECT event_type, xor(v, v >> 16) AS hv FROM h4),
r AS (
  SELECT event_type, hv % 64 AS reg,
         CASE WHEN hv // 64 = 0 THEN 27
              ELSE 27 - length(bin(hv // 64)) END AS rho
  FROM h
),
m AS (SELECT event_type, reg, max(rho) AS rho FROM r GROUP BY 1, 2),
s AS (
  SELECT event_type,
         CAST(64 - count(*) AS BIGINT) AS n_empty,
         SUM(CAST(power(2, 27 - rho) AS BIGINT)) AS snum
  FROM m GROUP BY 1
),
e AS (
  SELECT event_type, n_empty,
         0.709 * 4096 * 134217728 / (snum + n_empty * 134217728) AS raw
  FROM s
)
SELECT event_type, n_empty,
       floor(CASE WHEN raw <= 160 AND n_empty > 0
                  THEN 64 * ln(64.0 / n_empty) ELSE raw END * 1e6 + 0.5) / 1e6
         AS est_distinct
FROM e"""


# ---------------------------------------------------------------------------
# events_cms_counts — Count-Min point estimates vs exact
# ---------------------------------------------------------------------------


def q_events_cms_counts(sf_dir: str):
    """Count-Min (d=4, w=512) frequency estimate per distinct user vs the exact
    count (stages/sketches.py — bincount partials, 2048-cell merge, broadcast
    matrix point queries)."""
    from ..stages.sketches import cms_point_estimates

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return cms_point_estimates(ds, "user_id")


ORACLES5["events_cms_counts"] = f"""
WITH h AS (SELECT user_id, {_HV} AS hv FROM events),
seeds AS (SELECT unnest(range(4)) AS s),
cells AS (
  SELECT s, ((hv * (2 * s + 1) + s) % 4294967296) % 512 AS cell,
         CAST(count(*) AS BIGINT) AS n
  FROM h CROSS JOIN seeds GROUP BY 1, 2
),
k AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact, any_value(hv) AS hv
  FROM h GROUP BY 1
)
SELECT k.user_id, k.n_exact, CAST(min(c.n) AS BIGINT) AS n_est
FROM k CROSS JOIN seeds
JOIN cells c
  ON c.s = seeds.s
 AND c.cell = ((k.hv * (2 * seeds.s + 1) + seeds.s) % 4294967296) % 512
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# conv_reassemble — transcript → one training document per conversation
# ---------------------------------------------------------------------------


def q_conv_reassemble(sf_dir: str):
    """Each conversation's turns joined in turn order into one document
    (stages/clusters.py::reassemble_conversations — one conv-bucket exchange,
    vectorized in-bucket join)."""
    from ..sources import derive_transcripts_from_events
    from ..stages.clusters import reassemble_conversations

    ds = derive_transcripts_from_events(sf_dir)
    return reassemble_conversations(ds)


ORACLES5["conv_reassemble"] = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + """
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS full_text
FROM transcripts GROUP BY conv_id"""
)


# ---------------------------------------------------------------------------
# docs_collapse_repeats — consecutive-duplicate-token cleanup
# ---------------------------------------------------------------------------


def q_docs_collapse_repeats(sf_dir: str):
    """Collapse runs of identical adjacent words (needs a backreference, which
    RE2 lacks on both engines — done as a flat word-stream mask;
    stages/text_analysis.py::collapse_repeats_batch)."""
    from ..stages.text_analysis import collapse_repeats_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(collapse_repeats_batch, batch_format="pyarrow")


ORACLES5["docs_collapse_repeats"] = """
WITH s AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents),
f AS (SELECT doc_id, w, list_filter(w, (x, i) -> i = 1 OR x <> w[i - 1]) AS kept FROM s)
SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
       CAST(len(kept) AS BIGINT) AS n_words,
       CAST(len(w) - len(kept) AS BIGINT) AS n_removed
FROM f"""


# ---------------------------------------------------------------------------
# orders_weighted_sample — deterministic weight-proportional Bernoulli sample
# ---------------------------------------------------------------------------


def q_orders_weighted_sample(sf_dir: str):
    """Keep order o with probability min(1, 2·o_totalprice / 2^20): integer
    threshold compare against fnv32(o_orderkey) % 2^20 — weight-proportional
    sampling with zero RNG state and an exact SQL replay. Stateless
    map_batches filter; the natural importance-sampling primitive (price ≈
    'importance') at any scale."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def inner(t: pa.Table) -> pa.Table:
        h = fnv1a32_arrow(
            pc.cast(t["o_orderkey"], pa.string()).combine_chunks()
        ) % np.uint64(1 << 20)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        thresh = np.minimum(np.floor(price * 2.0), float(1 << 20)).astype(np.int64)
        mask = h.astype(np.int64) < thresh
        kept = t.filter(pa.array(mask))
        return pa.table(
            {
                "o_orderkey": kept["o_orderkey"],
                "o_totalprice": kept["o_totalprice"],
                "w_threshold": pa.array(thresh[mask]),
            }
        )

    return ds.map_batches(inner, batch_format="pyarrow")


ORACLES5["orders_weighted_sample"] = f"""
SELECT o_orderkey, o_totalprice,
       CAST(least(floor(o_totalprice * 2), 1048576) AS BIGINT) AS w_threshold
FROM orders
WHERE {_fnv32_sql("o_orderkey")} % 1048576
      < least(floor(o_totalprice * 2), 1048576)"""


# ---------------------------------------------------------------------------
# docs_postings — bounded inverted-index build
# ---------------------------------------------------------------------------

_POSTINGS_K = 50


def q_docs_postings(sf_dir: str):
    """(term, doc_id) posting pairs for the 50 highest-df terms
    (stages/text_analysis.py::postings_topdf — df combiner + tiny top-k
    broadcast, postings stream to the sink)."""
    from ..stages.text_analysis import postings_topdf

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return postings_topdf(ds, k=_POSTINGS_K)


ORACLES5["docs_postings"] = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents
),
d AS (SELECT DISTINCT doc_id, term FROM t WHERE term <> ''),
df AS (SELECT term, count(*) AS n FROM d GROUP BY 1),
top AS (SELECT term FROM df ORDER BY n DESC, term LIMIT {_POSTINGS_K})
SELECT d.term, d.doc_id FROM d JOIN top USING (term)"""


QUERIES5 = {
    "events_upsert_latest": q_events_upsert_latest,
    "events_rollup_hourly": q_events_rollup_hourly,
    "docs_chunks_overlap": q_docs_chunks_overlap,
    "events_approx_distinct": q_events_approx_distinct,
    "events_cms_counts": q_events_cms_counts,
    "conv_reassemble": q_conv_reassemble,
    "docs_collapse_repeats": q_docs_collapse_repeats,
    "orders_weighted_sample": q_orders_weighted_sample,
    "docs_postings": q_docs_postings,
}
