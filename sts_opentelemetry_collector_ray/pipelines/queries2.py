"""Driver-contract queries, wave 2: service-graph join/RED, envelope packing, and
the training-data operator family (dedup, text analysis, similarity search).

Same contract as queries.py: each Ray query has a DuckDB oracle with identical
column names/types where SQL can express the semantics; LSH/heuristic operators
(language ID, MinHash, SimHash, LSH-ANN) are registered without oracles — the driver
records the weaker rows-only check, and `tests/test_training_ops.py` carries their
brute-force oracles instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages.dedup_docs import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..stages.pack import pack_envelopes
from ..stages.parse import parse_stage
from ..stages.servicegraph import (
    DEFAULT_LATENCY_BOUNDS,
    edge_table,
    latency_histogram,
    red_metrics,
)
from ..stages.similarity import brute_force_topk, lsh_topk
from ..stages.text_analysis import (
    fingerprint_batch,
    lang_id_stage,
    quality_score_batch,
    token_count_batch,
)
from ..sources.transcripts import derive_transcripts_from_events
from .flagship import routed_dataset
from .queries import _PARSED_SQL, _ROUTES_SQL, STOP_SQL_LIST

EDGE_COLS = ["conv_id", "client_turn", "server_turn", "client_role", "tool", "failed", "latency_us"]

_EDGES_SQL = (
    _PARSED_SQL
    + """,
edges AS (
  SELECT p1.conv_id,
         p1.turn_idx AS client_turn,
         p2.turn_idx AS server_turn,
         p1.role AS client_role,
         p2.tool AS tool,
         CAST(p2.severity = 'ERROR' AS BIGINT) AS failed,
         date_diff('microsecond', p1.ts, p2.ts) AS latency_us
  FROM parsed p1
  JOIN parsed p2
    ON p2.conv_id = p1.conv_id AND p2.turn_idx = p1.turn_idx + 1
  WHERE p1.tool_name IS NOT NULL AND p2.role = 'tool' AND p2.tool = p1.tool_name
)
"""
)


def _parsed_transcripts(sf_dir: str):
    return parse_stage(derive_transcripts_from_events(sf_dir))


def q_sg_edges(sf_dir: str):
    """Span-pair join (J1): caller turn ↔ next tool turn within conversation."""
    return edge_table(_parsed_transcripts(sf_dir)).select_columns(EDGE_COLS)


def q_sg_red(sf_dir: str):
    """RED counters per series key (A1): requests, failures, total latency."""
    return red_metrics(edge_table(_parsed_transcripts(sf_dir)))


def q_sg_latency_hist(sf_dir: str):
    """Explicit-bounds latency histogram (A2), Go SearchFloat64s bucketing."""
    return latency_histogram(edge_table(_parsed_transcripts(sf_dir)))


def q_sg_red_dims(sf_dir: str):
    """RED counters with an EXTRA series dimension (status), the analogue of the
    connector's Dimensions config (stsservicegraphconnector/config.go:20-27)."""
    import pyarrow.compute as pc

    edges = edge_table(_parsed_transcripts(sf_dir))

    def add_status(t: pa.Table) -> pa.Table:
        status = pc.if_else(
            pc.equal(t["failed"], 1), pa.scalar("error"), pa.scalar("ok")
        )
        return t.append_column("status", status)

    return red_metrics(
        edges.map_batches(add_status, batch_format="pyarrow"),
        dimensions=["status"],
    )


def q_sg_topology_relations(sf_dir: str):
    """SURVEY §3.2 end-to-end: traces → service-graph RED metrics → topology
    relation rows (ststopologyexporter ConsumeMetrics path)."""
    from ..stages.servicegraph import servicegraph_relations

    return servicegraph_relations(red_metrics(edge_table(_parsed_transcripts(sf_dir))))


def q_envelope_pack(sf_dir: str):
    """Byte-capped envelope packing (A5) — greedy, first-seen order. Oracled via
    a RECURSIVE CTE that replays the capacity-reset running sum row-by-row per
    (data_source, shard_id) lineage (see ``_pack_oracle``)."""
    routed = routed_dataset(
        derive_transcripts_from_events(sf_dir), dedup=False, enrich_concurrency=2
    )
    return pack_envelopes(routed)


def q_traces_flatten(sf_dir: str):
    """K2 nested traces sink: turns → spans with list<struct> Events/Links
    columns (stages/traces.py, mirroring exporter_traces.go:214-302), projected
    to canonical JSON strings for the value-level oracle (the nested Arrow
    schema itself is asserted in tests)."""
    from ..stages.traces import traces_flatten_json, traces_table

    return traces_flatten_json(traces_table(_parsed_transcripts(sf_dir)))


def _attr_key(tok: str) -> str:
    b = f"substr({tok}, 6)"
    return (
        f"CASE WHEN strpos({b}, '=') > 0"
        f" THEN substr({b}, 1, strpos({b}, '=') - 1) ELSE {b} END"
    )


def _attr_val(tok: str) -> str:
    b = f"substr({tok}, 6)"
    return (
        f"CASE WHEN strpos({b}, '=') > 0"
        f" THEN substr({b}, strpos({b}, '=') + 1) ELSE '' END"
    )


def _traces_oracle() -> str:
    """SQL replay of stages/traces.py::spans_batch + flatten_json_batch: same
    span derivation, same attr-token events (split on ' ', 'attr.'-prefixed,
    first-'=' key/value split), same canonical JSON layouts."""
    k, v = _attr_key("at[j]"), _attr_val("at[j]")
    ev = (
        f"""'{{"attributes":{{"' || {k} || '":"' || {v} || '"}},"name":"' || {k}"""
        """ || '","ts":' || CAST(epoch_us(ts) + j*1000 AS VARCHAR) || '}'"""
    )
    prev = (
        """'{"attributes":{"link.type":"prev-turn"},"span_id":"' || conv_id ||"""
        """ '/' || CAST(turn_idx - 1 AS VARCHAR) || '","trace_id":"' ||"""
        """ conv_id || '","trace_state":""}'"""
    )
    root = (
        """'{"attributes":{"link.type":"trace-root"},"span_id":"' || conv_id ||"""
        """ '/0","trace_id":"' || conv_id || '","trace_state":""}'"""
    )
    return (
        _PARSED_SQL
        + f""",
atoks AS (
  SELECT *, list_filter(string_split(coalesce(text, ''), ' '),
                        x -> starts_with(x, 'attr.')) AS at
  FROM parsed
)
SELECT ts,
       conv_id AS trace_id,
       conv_id || '/' || CAST(turn_idx AS VARCHAR) AS span_id,
       CASE WHEN turn_idx = 0 THEN ''
            ELSE conv_id || '/' || CAST(turn_idx - 1 AS VARCHAR) END AS parent_span_id,
       '' AS trace_state,
       role AS span_name,
       CASE WHEN role = 'tool' THEN 'SPAN_KIND_CLIENT'
            WHEN role = 'user' THEN 'SPAN_KIND_SERVER'
            ELSE 'SPAN_KIND_INTERNAL' END AS span_kind,
       CASE WHEN coalesce(tool, '') = '' THEN 'conversation' ELSE tool END AS service_name,
       'transcripts' AS scope_name,
       '1.0' AS scope_version,
       '{{"role":"' || role || '","severity":"' || severity || '"' ||
         CASE WHEN coalesce(tool, '') = '' THEN '}}'
              ELSE ',"tool":"' || tool || '"}}' END AS span_attributes,
       CAST(length(coalesce(text, '')) * 1000 AS BIGINT) AS duration_ns,
       CASE WHEN severity = 'ERROR' THEN 'STATUS_CODE_ERROR'
            ELSE 'STATUS_CODE_UNSET' END AS status_code,
       CASE WHEN severity = 'ERROR' THEN coalesce(text, '') ELSE '' END AS status_message,
       CASE WHEN turn_idx = 0 THEN 'SPAN_PARENT_TYPE_ROOT'
            WHEN role = 'user' THEN 'SPAN_PARENT_TYPE_EXTERNAL'
            ELSE 'SPAN_PARENT_TYPE_INTERNAL' END AS span_parent_type,
       '[' || coalesce(
           array_to_string(list_transform(range(1, len(at) + 1), j -> {ev}), ','),
           '') || ']' AS events_json,
       CASE WHEN turn_idx = 0 THEN '[]'
            WHEN turn_idx = 1 THEN '[' || {prev} || ']'
            ELSE '[' || {prev} || ',' || {root} || ']' END AS links_json
FROM atoks"""
    )


def q_tail_sample(sf_dir: str):
    """Tail-based sampling (the reference's tailsamplingprocessor BOM entry,
    agent-otel-builder.yaml:44): whole-trace keep/drop from span evidence —
    latency, numeric-attribute, probabilistic, and composite AND(status,
    probabilistic) policies; first Sampled vote wins the ``sampled_by``
    attribution. One bounded bucket exchange (stages/tailsampling.py)."""
    from ..stages.tailsampling import (
        AndPolicy,
        LatencyPolicy,
        NumericAttributePolicy,
        ProbabilisticPolicy,
        StatusCodePolicy,
        tail_sample,
    )

    policies = [
        LatencyPolicy("slow", threshold_ms=2_556_000_000),
        NumericAttributePolicy("long", col="turn_idx", min_value=75),
        ProbabilisticPolicy("prob", pct=15),
        AndPolicy(
            "err_prob",
            sub=(
                StatusCodePolicy("err", codes=("ERROR",)),
                ProbabilisticPolicy("p25", pct=25),
            ),
        ),
    ]
    out = tail_sample(_parsed_transcripts(sf_dir), policies)
    return out.select_columns(
        ["conv_id", "turn_idx", "role", "tool", "severity", "ts", "sampled_by"]
    )


def _fnv_mod(col: str, m: int) -> str:
    """fnv1a32(col) % m — byte-exact vs functions/hashing.py for ASCII input."""
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        f"list_transform(string_split({col}, ''), c -> unicode(c)::BIGINT)), "
        f"(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % {m}"
    )


def _tail_sample_oracle() -> str:
    """SQL replay of stages/tailsampling.py: per-trace stats window, policy
    votes in config order (first match attributes), traces with no vote drop
    every span."""
    return (
        _PARSED_SQL
        + f""",
stats AS (
  SELECT conv_id,
         (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000 AS dur_ms,
         max(turn_idx) AS max_turn,
         bool_or(severity = 'ERROR') AS has_err,
         {_fnv_mod("conv_id", 100)} AS h
  FROM parsed GROUP BY conv_id
),
dec AS (
  SELECT conv_id,
         CASE WHEN dur_ms >= 2556000000 THEN 'slow'
              WHEN max_turn >= 75 THEN 'long'
              WHEN h < 15 THEN 'prob'
              WHEN has_err AND h < 25 THEN 'err_prob'
              ELSE NULL END AS sampled_by
  FROM stats
)
SELECT p.conv_id, p.turn_idx, p.role, p.tool, p.severity, p.ts, d.sampled_by
FROM parsed p JOIN dec d USING (conv_id)
WHERE d.sampled_by IS NOT NULL"""
    )


def q_text_redact(sf_dir: str):
    """PII-style text redaction over transcript turns: ordered regex ruleset
    (email / IPv4 / tool-call argument / digit run), per-category counts on the
    original text, sequential rewrite (stages/redact.py). RE2 on both sides —
    Arrow and DuckDB rewrite byte-identically."""
    from ..stages.redact import redact_stage

    out = redact_stage(_parsed_transcripts(sf_dir))
    return out.select_columns(
        ["conv_id", "turn_idx", "n_email", "n_ipv4", "n_call_arg", "n_number", "redacted"]
    )


_REDACT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_REDACT_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_REDACT_CALL = r"call:([a-z]+)\(([^)]*)\)"
_REDACT_NUM = "[0-9]+"


def _text_redact_oracle() -> str:
    t = "coalesce(text, '')"
    red = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace({t}, "
        f"'{_REDACT_EMAIL}', '<EMAIL>', 'g'), "
        f"'{_REDACT_IPV4}', '<IP>', 'g'), "
        f"'{_REDACT_CALL}', 'call:\\1(<ARG>)', 'g'), "
        f"'{_REDACT_NUM}', '<NUM>', 'g')"
    )
    return (
        _PARSED_SQL
        + f"""
SELECT conv_id, turn_idx,
       len(regexp_extract_all({t}, '{_REDACT_EMAIL}')) AS n_email,
       len(regexp_extract_all({t}, '{_REDACT_IPV4}')) AS n_ipv4,
       len(regexp_extract_all({t}, '{_REDACT_CALL}')) AS n_call_arg,
       len(regexp_extract_all({t}, '{_REDACT_NUM}')) AS n_number,
       {red} AS redacted
FROM parsed"""
    )


# -- documents family -------------------------------------------------------

def q_docs_dedup_exact(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


def q_docs_token_count(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )


def q_docs_quality(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_chars_actual", "punct_ratio", "stopword_ratio"]
    )


def q_docs_fingerprint(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


def q_docs_langid(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id_stage(ds, concurrency=2).select_columns(
        ["doc_id", "lang_pred", "lang_score"]
    )


def q_docs_minhash_pairs(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, jaccard_threshold=0.5)


def q_docs_simhash_pairs(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


def q_docs_ngram_jaccard(sf_dir: str):
    """Exact all-pairs Jaccard — restricted to the first 200 docs (O(n²) baseline
    operator; the LSH variants are the scale path). Returns a DataFrame (tiny by
    construction): when NO pair clears the threshold — the sf0.1 slice — Ray
    drops the schema of the all-empty Dataset (the CLAUDE.md empty-block
    hazard), so the typed empty frame is restored here to keep the strict
    dtype gate honest."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ray.data.from_arrow(t.slice(0, 200))
    out = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "jaccard": pd.Series(dtype=np.float64),
            }
        )
    return out


# -- embeddings family ------------------------------------------------------

def _load_queries(sf_dir: str, n: int = 5):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    head = t.slice(0, n)
    q = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()])
    return q, head["vec_id"].to_numpy(zero_copy_only=False)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for the first 5 vectors (exact ANN baseline):
    broadcast query matrix + per-batch matmul partials, no shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q, qids = _load_queries(sf_dir)
    return brute_force_topk(ds, q, qids, k=10)


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate top-10 (scale path; recall<1 ⇒ rows-only check,
    recall asserted vs the exact baseline in tests)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q, qids = _load_queries(sf_dir)
    return lsh_topk(ds, q, qids, k=10, num_planes=6)


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed approximate top-10: inverted lists + nprobe probing with a
    seeded data-independent quantizer (`seeded_centroids`) so the DuckDB oracle
    can inline the centroid constants (the ann_lsh hyperplane trick) and replay
    assign → nprobe → top-k exactly. The k-means-trained quantizer path is
    covered by recall/determinism unit tests."""
    from ..stages.similarity import ivf_topk, seeded_centroids

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q, qids = _load_queries(sf_dir)
    return ivf_topk(
        ds, q, qids, k=10, num_centroids=16, nprobe=4,
        centroids=seeded_centroids(64, 16, seed=42),
    )


def q_emb_neardup(sf_dir: str):
    """Exact cosine near-dup pairs ≥ 0.45 (float64 both sides)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, threshold=0.45)


# -- export-side operators ---------------------------------------------------

def _routed(sf_dir: str):
    return routed_dataset(
        derive_transcripts_from_events(sf_dir), dedup=False, enrich_concurrency=2
    )


def q_usage_bytes(sf_dir: str):
    """stsusageprocessor analogue (A7): UTF-8 payload bytes metered per sink."""
    from ..stages.export import usage_bytes

    return usage_bytes(_routed(sf_dir))


def q_hash_sample(sf_dir: str):
    """Deterministic tail-sampling analogue (O4): FNV(conv:turn) % 100 < 10."""
    from ..stages.export import hash_sample

    return hash_sample(derive_transcripts_from_events(sf_dir), pct=10)


def q_topology_collections(sf_dir: str):
    """ststopologyexporter analogue (K6): per-tenant collection with
    deterministically sorted component/relation ids (counts oracled in SQL,
    payload JSON asserted in unit tests)."""
    from ..stages.export import topology_collections

    ds = topology_collections(_routed(sf_dir), key_col="role")
    return ds.select_columns(["key", "n_components", "n_relations"])


def q_resources_dedup(sf_dir: str):
    """clickhouse resources analogue (K5): one row per distinct attr projection."""
    from ..stages.export import resource_dedup

    ds = resource_dedup(derive_transcripts_from_events(sf_dir), ["role", "tool"])
    return ds.select_columns(["role", "tool"])


_BOUNDS_SQL = "[" + ", ".join(str(b) for b in DEFAULT_LATENCY_BOUNDS) + "]"

_FNV_PCT = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(conv_id || ':' || CAST(turn_idx AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 100"
)

ORACLES2: dict[str, str] = {
    "sg_edges": _EDGES_SQL
    + "SELECT conv_id, client_turn, server_turn, client_role, tool, failed, latency_us FROM edges",
    "sg_red": _EDGES_SQL
    + """SELECT tool, client_role, COUNT(*) AS n, CAST(SUM(failed) AS BIGINT) AS failed,
       CAST(SUM(latency_us) AS BIGINT) AS latency_us_sum
FROM edges GROUP BY tool, client_role""",
    "sg_red_dims": _EDGES_SQL
    + """SELECT tool, client_role,
       CASE WHEN failed = 1 THEN 'error' ELSE 'ok' END AS status,
       COUNT(*) AS n, CAST(SUM(failed) AS BIGINT) AS failed,
       CAST(SUM(latency_us) AS BIGINT) AS latency_us_sum
FROM edges GROUP BY 1, 2, 3""",
    "sg_topology_relations": _EDGES_SQL
    + """SELECT 'urn:role/' || client_role || '-' || 'urn:tool/' || tool AS external_id,
       'urn:role/' || client_role AS source_id,
       'urn:tool/' || tool AS target_id,
       'calls' AS type_name,
       COUNT(*) AS n,
       CAST(SUM(failed) AS BIGINT) AS failed
FROM edges GROUP BY client_role, tool""",
    "sg_latency_hist": _EDGES_SQL
    + f"""SELECT tool,
       CAST(len(list_filter({_BOUNDS_SQL}, b -> b < latency_us / 1000000.0)) AS BIGINT) AS bucket_idx,
       COUNT(*) AS n
FROM edges GROUP BY 1, 2""",
    "docs_dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    "docs_token_count": """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
FROM documents""",
    "docs_quality": f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       round((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) * 1.0
             / greatest(1, length(text)), 6) AS punct_ratio,
       round(len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
                             t -> list_contains({STOP_SQL_LIST}, t))) * 1.0
             / greatest(1, len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))), 6)
             AS stopword_ratio
FROM documents""",
    "docs_fingerprint": """
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT,
                   list_transform(string_split(text, ''), c -> unicode(c)::BIGINT)),
                   (acc, x) -> (acc * 131 + x) % 2147483647) AS fingerprint
FROM documents""",
    "ann_topk": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id, rank
FROM ranked WHERE rank <= 10""",
    "emb_neardup": """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45""",
    "usage_bytes": _ROUTES_SQL
    + "SELECT sink, CAST(SUM(COALESCE(octet_length(encode(text)), 0)) AS BIGINT) AS total_bytes FROM routes GROUP BY sink",
    "hash_sample": _PARSED_SQL
    + f"SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts WHERE {_FNV_PCT} < 10",
    "topology_collections": _ROUTES_SQL
    + """SELECT role AS key,
       CAST(count(DISTINCT CASE WHEN data_source <> 'urn:mapping:conv-uses-tool'
                                THEN external_id END) AS BIGINT) AS n_components,
       CAST(count(DISTINCT CASE WHEN data_source = 'urn:mapping:conv-uses-tool'
                                THEN external_id END) AS BIGINT) AS n_relations
FROM routes GROUP BY role""",
    "resources_dedup": _PARSED_SQL + "SELECT DISTINCT role, tool FROM transcripts",
}


def _langid_oracle() -> str:
    """SQL replica of LangIdActor: distinct char trigrams of ' '+lower(text)+' ',
    per-language overlap ratio vs the seed profiles, first-language-wins ties
    (the engine only replaces on strictly-greater score)."""
    from ..stages.text_analysis import _profiles

    profs = _profiles()
    order = list(profs)  # dict order == engine iteration order
    lists = {
        lang: "[" + ", ".join("'" + g.replace("'", "''") + "'" for g in sorted(p)) + "]"
        for lang, p in profs.items()
    }
    score_cols = ",\n  ".join(
        f"CASE WHEN len(grams) = 0 THEN 0.0 ELSE len(list_filter(grams, "
        f"t -> list_contains({lists[lang]}, t))) * 1.0 / len(grams) END AS s_{lang}"
        for lang in order
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in order) + ")"
    pick = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in order)
    return f"""
WITH s1 AS (SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents),
g AS (SELECT doc_id, list_distinct(list_transform(range(greatest(length(s) - 2, 0)),
             i -> substring(s, CAST(i AS INT) + 1, 3))) AS grams FROM s1),
sc AS (SELECT doc_id, grams,
  {score_cols}
FROM g),
fin AS (SELECT doc_id, grams, {best} AS best, * FROM sc)
SELECT doc_id,
       CASE WHEN len(grams) = 0 OR best <= 0 THEN 'und' {pick} ELSE 'und' END AS lang_pred,
       round(best, 6) AS lang_score
FROM fin"""


ORACLES2["docs_langid"] = _langid_oracle()

# Envelope packing (A5) as a RECURSIVE CTE: the greedy capacity-reset running
# sum steps one row per iteration per (data_source, shard_id) lineage —
# byte-exact vs stages/pack.py::_pack_group (64 B/row overhead + char lengths
# of external_id/name/type_name/tags/text; non-CREATE rows are solo envelopes).
_PACK_ROUTES = """
routes_full AS (
  SELECT 'urn:mapping:all-turns' AS data_source, 'CREATE' AS action,
         'urn:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS external_id,
         role AS name, 'turn' AS type_name, CAST(NULL AS VARCHAR) AS tags,
         text, conv_id, turn_idx
  FROM parsed
  UNION ALL
  SELECT 'urn:mapping:error-turns', 'CREATE',
         'urn:conv/' || conv_id || ':turn/' || CAST(turn_idx AS VARCHAR),
         coalesce(tool_sig, 'none'), 'error-turn', NULL, text, conv_id, turn_idx
  FROM parsed WHERE severity = 'ERROR'
  UNION ALL
  SELECT 'urn:mapping:tool-calls', 'CREATE',
         'urn:tool/' || tool || '/call/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         tool, 'tool-call', NULL, NULL, conv_id, turn_idx
  FROM parsed WHERE tool <> '' AND role = 'tool'
  UNION ALL
  SELECT 'urn:mapping:diag-turns', 'CREATE',
         'urn:diag/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         NULL, 'diag-turn',
         CASE WHEN contains(text, 'attr.')
              THEN '{"t.et":"view","t.zone":"' || regexp_extract(text, 'attr\\.zone=(\\S+)', 1) || '"}'
              ELSE '{}' END,
         text, conv_id, turn_idx
  FROM parsed WHERE severity IN ('WARN', 'DEBUG')
  UNION ALL
  SELECT 'urn:mapping:conv-uses-tool', 'CREATE',
         'urn:conv/' || conv_id || '-urn:tool/' || tool,
         NULL, 'uses', NULL, NULL, conv_id, turn_idx
  FROM parsed WHERE tool <> ''
  UNION ALL
  -- DELETE ships identity only (handleComponentDelete, mapping_handler.go:226-265):
  -- type_name is NULL, shrinking the metered row by length('turn').
  SELECT 'urn:mapping:session-delete', 'DELETE',
         'urn:turn/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         NULL, CAST(NULL AS VARCHAR), NULL, text, conv_id, turn_idx
  FROM parsed WHERE severity = 'UNKNOWN'
  UNION ALL
  SELECT 'urn:mapping:bad-required', 'CREATE',
         NULL, NULL, NULL, NULL, text, conv_id, turn_idx
  FROM parsed WHERE severity = 'ERROR'
),
sized AS (
  SELECT data_source,
         CASE WHEN external_id IS NULL THEN 'unknown'
              ELSE __SHARD__ END AS shard_id,
         CAST(regexp_replace(conv_id, '[^0-9]', '', 'g') AS BIGINT) // __BUCKET__ AS bucket,
         action, conv_id, turn_idx,
         64 + length(coalesce(external_id, '')) + length(coalesce(name, ''))
            + length(coalesce(type_name, '')) + length(coalesce(tags, ''))
            + length(coalesce(text, '')) AS size
  FROM routes_full
),
seq AS (
  SELECT *, row_number() OVER (PARTITION BY data_source, shard_id, bucket
                               ORDER BY conv_id, turn_idx) AS rn
  FROM sized
),
gstat AS (
  SELECT data_source, shard_id, bucket, SUM(size) AS tot, COUNT(*) AS n,
         SUM(CASE WHEN action <> 'CREATE' THEN 1 ELSE 0 END) AS solos
  FROM sized GROUP BY 1, 2, 3
),
-- fast paths: all-CREATE buckets under the cap pack to ONE envelope; all-solo
-- buckets are one envelope per row; only the remaining buckets need recursion
rseq AS (
  SELECT s.* FROM seq s JOIN gstat g USING (data_source, shard_id, bucket)
  WHERE NOT (g.solos = 0 AND g.tot <= __CAP__) AND g.solos <> g.n
),
packed AS (
  SELECT data_source, shard_id, bucket, rn, conv_id, turn_idx, size,
         CAST(0 AS BIGINT) AS env,
         CAST(CASE WHEN action <> 'CREATE' THEN 0 ELSE size END AS BIGINT) AS acc,
         (action = 'CREATE') AS open
  FROM rseq WHERE rn = 1
  UNION ALL
  SELECT r.data_source, r.shard_id, r.bucket, r.rn, r.conv_id, r.turn_idx, r.size,
         CASE WHEN r.action <> 'CREATE' THEN p.env + 1
              WHEN NOT p.open OR (p.acc + r.size > __CAP__ AND p.acc > 0) THEN p.env + 1
              ELSE p.env END,
         CAST(CASE WHEN r.action <> 'CREATE' THEN 0
              WHEN NOT p.open OR (p.acc + r.size > __CAP__ AND p.acc > 0) THEN r.size
              ELSE p.acc + r.size END AS BIGINT),
         (r.action = 'CREATE')
  FROM rseq r JOIN packed p
    ON r.data_source = p.data_source AND r.shard_id = p.shard_id
   AND r.bucket = p.bucket AND r.rn = p.rn + 1
),
-- per-bucket local envelopes (recursive buckets + the two fast paths)
envs AS (
  SELECT data_source, shard_id, bucket, env,
         COUNT(*) AS n_rows, CAST(SUM(size) AS BIGINT) AS bytes,
         arg_min(conv_id, rn) AS first_conv, arg_min(turn_idx, rn) AS first_turn
  FROM packed GROUP BY 1, 2, 3, 4
  UNION ALL
  SELECT s.data_source, s.shard_id, s.bucket, CAST(0 AS BIGINT),
         COUNT(*), CAST(SUM(s.size) AS BIGINT),
         arg_min(s.conv_id, s.rn), arg_min(s.turn_idx, s.rn)
  FROM seq s JOIN gstat g USING (data_source, shard_id, bucket)
  WHERE g.solos = 0 AND g.tot <= __CAP__
  GROUP BY 1, 2, 3
  UNION ALL
  SELECT s.data_source, s.shard_id, s.bucket, CAST(s.rn - 1 AS BIGINT),
         CAST(1 AS BIGINT), CAST(s.size AS BIGINT), s.conv_id, s.turn_idx
  FROM seq s JOIN gstat g USING (data_source, shard_id, bucket)
  WHERE g.solos = g.n
),
-- bucket-count prefix sums make envelope_idx dense per (data_source, shard_id)
offs AS (
  SELECT data_source, shard_id, bucket,
         CAST(SUM(ne) OVER (PARTITION BY data_source, shard_id ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) - ne AS BIGINT) AS off
  FROM (SELECT data_source, shard_id, bucket, COUNT(*) AS ne
        FROM envs GROUP BY 1, 2, 3) t
)
SELECT e.data_source, e.shard_id, e.env + o.off AS envelope_idx,
       e.n_rows, e.bytes, e.first_conv, e.first_turn
FROM envs e JOIN offs o USING (data_source, shard_id, bucket)"""


def _pack_oracle() -> str:
    from .. import ENVELOPE_MAX_BYTES
    from ..stages.pack import CONVS_PER_BUCKET

    body = (
        _PACK_ROUTES.replace("__SHARD__", _FNV_SHARD_PACK)
        .replace("__CAP__", str(ENVELOPE_MAX_BYTES))
        .replace("__BUCKET__", str(CONVS_PER_BUCKET))
    )
    sql = _PARSED_SQL + "," + body
    # the packed CTE is recursive — promote the whole WITH chain
    return sql.replace("WITH ev AS", "WITH RECURSIVE ev AS", 1)


_FNV_SHARD_PACK = (
    "CAST(list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(external_id, ''), c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 4 AS VARCHAR)"
)

ORACLES2["envelope_pack"] = _pack_oracle()


def _simhash_oracle() -> str:
    """SQL replica of the SimHash near-dup operator: FNV-1a64 per whitespace
    token (HUGEINT arithmetic matches the numpy kernel bit-for-bit), 64
    majority bit-votes per doc, then ALL pairs with Hamming ≤ 3 — exactly the
    block-LSH result, because the pigeonhole split is exhaustive at that
    distance and verification is exact."""
    powers = ", ".join(f"CAST({1 << b} AS HUGEINT)" for b in range(64))
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
           list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS HUGEINT))),
           (acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS hv
  FROM toks
),
powers AS (SELECT unnest(range(64)) AS b, unnest([{powers}]) AS p),
votes AS (
  SELECT doc_id, b, p,
         SUM(CAST((hv // p) % 2 AS BIGINT)) AS ones, COUNT(*) AS n
  FROM h CROSS JOIN powers GROUP BY doc_id, b, p
),
sim0 AS (
  SELECT doc_id,
         SUM(CASE WHEN 2 * ones > n THEN p ELSE CAST(0 AS HUGEINT) END) AS sim
  FROM votes GROUP BY doc_id
),
simfull AS (
  SELECT d.doc_id, coalesce(s.sim, CAST(0 AS HUGEINT)) AS sim
  FROM documents d LEFT JOIN sim0 s USING (doc_id)
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
FROM simfull a JOIN simfull b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3"""


ORACLES2["docs_simhash_pairs"] = _simhash_oracle()


def _minhash_oracle(src: str = "documents") -> str:
    """SQL replica of minhash_lsh_pairs: FNV-64 shingle hashes, the 64
    permutations ((h·a mod 2⁶⁴ + b) mod 2⁶⁴) mod (2⁶¹−1) — replicating the
    numpy uint64 WRAP exactly — per-doc minima, band-tuple candidate join
    (exact tuple equality ⟺ the engine's band hash modulo astronomically
    unlikely collisions), signature-Jaccard estimate ≥ 0.5."""
    from ..stages.dedup_docs import _perm_params

    a_par, b_par = _perm_params(64)
    pa_sql = ", ".join(f"CAST({int(v)} AS HUGEINT)" for v in a_par)
    pb_sql = ", ".join(f"CAST({int(v)} AS HUGEINT)" for v in b_par)
    w = 1 << 64
    m = (1 << 61) - 1
    # inline 5-char FNV (no per-element lambda machinery) for the common case;
    # the rare <5-char whole-doc shingle falls back to list_reduce
    fnv5 = "CAST(14695981039346656037 AS HUGEINT)"
    for i in range(1, 6):
        fnv5 = (
            f"(xor({fnv5}, CAST(unicode(substring(g, {i}, 1)) AS HUGEINT))"
            f" * 1099511628211) % {w}"
        )
    return f"""
WITH docs0 AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
  FROM {src}
),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN length(s) = 0 THEN []::VARCHAR[]
                     WHEN length(s) < 5 THEN [s]
                     ELSE list_transform(range(length(s) - 4),
                          i -> substring(s, CAST(i AS INT) + 1, 5)) END) AS g
  FROM docs0
),
hh AS (
  SELECT doc_id,
         CASE WHEN length(g) = 5 THEN {fnv5}
              ELSE list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
                list_transform(string_split(g, ''), c -> CAST(unicode(c) AS HUGEINT))),
                (acc, x) -> (xor(acc, x) * 1099511628211) % {w}) END AS hv
  FROM sh
),
perms AS (SELECT unnest(range(64)) AS perm,
                 unnest([{pa_sql}]) AS pa, unnest([{pb_sql}]) AS pb),
hd AS MATERIALIZED (SELECT DISTINCT doc_id, hv FROM hh),
sig0 AS (
  SELECT doc_id, perm, MIN((((hv * pa) % {w}) + pb) % {w} % {m}) AS mh
  FROM hd CROSS JOIN perms GROUP BY doc_id, perm
),
sigfull AS (
  SELECT d.doc_id, p.perm, coalesce(s.mh, CAST({m} AS HUGEINT)) AS mh
  FROM (SELECT doc_id FROM {src}) d
  CROSS JOIN perms p
  LEFT JOIN sig0 s ON s.doc_id = d.doc_id AND s.perm = p.perm
),
bands AS (
  SELECT doc_id, perm // 4 AS band, list(mh ORDER BY perm) AS bv
  FROM sigfull GROUP BY doc_id, perm // 4
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
),
est AS (
  SELECT c.a, c.b,
         SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 64.0 AS j
  FROM cand c
  JOIN sigfull sa ON sa.doc_id = c.a
  JOIN sigfull sb ON sb.doc_id = c.b AND sb.perm = sa.perm
  GROUP BY c.a, c.b
)
SELECT a, b, round(j, 6) AS jaccard FROM est WHERE j >= 0.5"""


ORACLES2["docs_minhash_pairs"] = _minhash_oracle()


def _ann_lsh_oracle(dim: int = 64, num_planes: int = 6, k: int = 10) -> str:
    """SQL replica of lsh_topk: the seed-42 hyperplanes are inlined as float
    literals (repr round-trips doubles exactly), buckets are dot-product sign
    bits (sign on raw vectors == sign on unit vectors), probes are the bucket
    plus all one-bit flips, candidates score by cosine, rank ≤ k with the
    engine's (score desc, neighbor asc) tie-break. Assumes the driver-testdata
    embedding dim (64)."""
    planes = np.random.default_rng(42).standard_normal((dim, num_planes))

    def bucket_expr(col: str) -> str:
        terms = []
        for b in range(num_planes):
            vec = "[" + ", ".join(repr(float(x)) for x in planes[:, b]) + "]"
            terms.append(
                f"CASE WHEN list_dot_product({col}, {vec}) > 0 THEN {1 << b} ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    flips = ", ".join(str(f) for f in [0] + [1 << b for b in range(num_planes)])
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
),
qb AS (SELECT query_id, qv, {bucket_expr('qv')} AS b FROM q),
probes AS (
  SELECT query_id, qv, xor(b, f.f) AS probe
  FROM qb, (SELECT unnest([{flips}]) AS f) f
),
corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {bucket_expr('CAST(embedding AS DOUBLE[])')} AS b
  FROM embeddings
),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(c.v, p.qv) AS score
  FROM corpus c JOIN probes p ON c.b = p.probe
  WHERE c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id, rank
FROM ranked WHERE rank <= {k}"""


ORACLES2["ann_lsh"] = _ann_lsh_oracle()


def _ann_ivf_oracle(
    dim: int = 64, num_centroids: int = 16, nprobe: int = 4, k: int = 10
) -> str:
    """SQL replica of ivf_topk with the seeded quantizer: the unit-normalized
    seed-42 centroid constants are inlined (exactly the doubles the engine
    broadcasts — repr round-trips), corpus vectors assign to their argmax-dot
    centroid (ties → LOWEST cid, numpy argmax), each query probes its top-nprobe
    centroids (ties → HIGHEST cid: np.argsort is stable ascending and the
    engine reverses the whole row), candidates rank by cosine with the engine's
    (score desc, neighbor asc) tie-break."""
    from ..stages.similarity import _unit, seeded_centroids

    cents = _unit(seeded_centroids(dim, num_centroids, seed=42))
    values = ",\n    ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cents[ci]) + "])"
        for ci in range(num_centroids)
    )
    return f"""
WITH cents(cid, c) AS (
  SELECT * FROM (VALUES
    {values}
  ) t(cid, c)
),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
),
qprobe AS (
  SELECT query_id, qv, cid,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_dot_product(qv, c) DESC, cid DESC) AS pr
  FROM q, cents
),
probes AS (SELECT query_id, qv, cid FROM qprobe WHERE pr <= {nprobe}),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assign AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, c) DESC, cid ASC) AS r
  FROM corpus, cents
),
corpus_a AS (SELECT vec_id, v, cid FROM assign WHERE r = 1),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(c.v, p.qv) AS score
  FROM corpus_a c JOIN probes p ON c.cid = p.cid
  WHERE c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id, rank
FROM ranked WHERE rank <= {k}"""


ORACLES2["ann_ivf"] = _ann_ivf_oracle()


def q_emb_kmeans(sf_dir: str):
    """K-means cluster assignment over the embedding corpus (the curation step
    behind cluster-balanced sampling / semantic dedup): seeded data-independent
    centroids broadcast once, one matmul+argmax per batch
    (stages/similarity.py::kmeans_assign)."""
    from ..stages.similarity import kmeans_assign, seeded_centroids

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_assign(ds, seeded_centroids(64, 8, seed=42))


def _emb_kmeans_oracle(dim: int = 64, k: int = 8) -> str:
    """Replays kmeans_assign: inlined unit seed-42 centroids, argmax by raw-dot
    (scale-invariant per row; ties → lowest cid like numpy argmax)."""
    from ..stages.similarity import _unit, seeded_centroids

    cents = _unit(seeded_centroids(dim, k, seed=42))
    values = ",\n    ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cents[ci]) + "])"
        for ci in range(k)
    )
    return f"""
WITH cents(cid, c) AS (
  SELECT * FROM (VALUES
    {values}
  ) t(cid, c)
),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assign AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, c) DESC, cid ASC) AS r
  FROM corpus, cents
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM assign WHERE r = 1"""


def q_emb_semantic_dedup(sf_dir: str):
    """SemDeDup-shaped semantic dedup (the SCALE PATH for embedding near-dup,
    upgrading the exact all-pairs baseline `emb_neardup`): k-means bucket →
    in-cluster cosine → drop vectors with an earlier in-cluster neighbor
    ≥ 0.3 (stages/similarity.py::semantic_dedup)."""
    from ..stages.similarity import seeded_centroids, semantic_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup(ds, seeded_centroids(64, 8, seed=42), threshold=0.3)


def _emb_semantic_dedup_oracle(dim: int = 64, k: int = 8, tau: float = 0.3) -> str:
    """Replays semantic_dedup: inlined unit seed-42 centroids, argmax-by-dot
    assignment (ties → lowest cid), then the NOT-EXISTS-earlier-neighbor
    predicate — the exact non-cascading drop rule of the kernel."""
    from ..stages.similarity import _unit, seeded_centroids

    cents = _unit(seeded_centroids(dim, k, seed=42))
    values = ",\n    ".join(
        f"({ci}, [" + ", ".join(repr(float(x)) for x in cents[ci]) + "])"
        for ci in range(k)
    )
    return f"""
WITH cents(cid, c) AS (
  SELECT * FROM (VALUES
    {values}
  ) t(cid, c)
),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assign AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, c) DESC, cid ASC) AS r
  FROM corpus, cents
),
a AS (SELECT vec_id, v, cid FROM assign WHERE r = 1)
SELECT x.vec_id, CAST(x.cid AS BIGINT) AS cluster
FROM a x
WHERE NOT EXISTS (
  SELECT 1 FROM a y
  WHERE y.cid = x.cid AND y.vec_id < x.vec_id
    AND list_cosine_similarity(x.v, y.v) >= {tau})"""


ORACLES2["emb_semantic_dedup"] = _emb_semantic_dedup_oracle()


ORACLES2["emb_kmeans"] = _emb_kmeans_oracle()

# Exact 5-gram Jaccard over the first 200 docs (doc_id == file position in the
# driver testdata): the engine hashes shingles (FNV-64) but set sizes are
# collision-free at this scale, so string-shingle Jaccard is the same value.
ORACLES2["docs_ngram_jaccard"] = """
WITH d0 AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
            FROM documents ORDER BY doc_id LIMIT 200),
d AS (SELECT doc_id,
        CASE WHEN length(s) = 0 THEN []::VARCHAR[]
             WHEN length(s) < 5 THEN [s]
             ELSE list_distinct(list_transform(range(length(s) - 4),
                                i -> substring(s, CAST(i AS INT) + 1, 5)))
        END AS sh
      FROM d0),
p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        len(list_intersect(a.sh, b.sh)) AS inter,
        len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
      FROM d a JOIN d b ON a.doc_id < b.doc_id)
SELECT a, b, round(inter * 1.0 / uni, 6) AS jaccard
FROM p WHERE uni > 0 AND inter * 1.0 / uni >= 0.5"""

ORACLES2["traces_flatten"] = _traces_oracle()
ORACLES2["tail_sample"] = _tail_sample_oracle()
ORACLES2["text_redact"] = _text_redact_oracle()

QUERIES2 = {
    "traces_flatten": q_traces_flatten,
    "tail_sample": q_tail_sample,
    "text_redact": q_text_redact,
    "sg_edges": q_sg_edges,
    "sg_red": q_sg_red,
    "sg_red_dims": q_sg_red_dims,
    "sg_latency_hist": q_sg_latency_hist,
    "sg_topology_relations": q_sg_topology_relations,
    "envelope_pack": q_envelope_pack,
    "docs_dedup_exact": q_docs_dedup_exact,
    "docs_token_count": q_docs_token_count,
    "docs_quality": q_docs_quality,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_langid": q_docs_langid,
    "docs_minhash_pairs": q_docs_minhash_pairs,
    "docs_simhash_pairs": q_docs_simhash_pairs,
    "docs_ngram_jaccard": q_docs_ngram_jaccard,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "emb_kmeans": q_emb_kmeans,
    "emb_semantic_dedup": q_emb_semantic_dedup,
    "emb_neardup": q_emb_neardup,
    "usage_bytes": q_usage_bytes,
    "hash_sample": q_hash_sample,
    "topology_collections": q_topology_collections,
    "resources_dedup": q_resources_dedup,
}
