from .parse import PROCESSING_TS, parse_batch, parse_stage
from .enrich import EnrichActor, ROLE_CLASS, TOOL_INFO, enrich_stage
from .route import ROUTED_SCHEMA, Router, route_stage
from .dedup import finalize_routed
from .aggregate import sink_counts
from .pack import pack_envelopes
from .servicegraph import (
    DEFAULT_LATENCY_BOUNDS,
    edge_table,
    latency_histogram,
    red_metrics,
)
from .export import hash_sample, resource_dedup, topology_collections, usage_bytes
from .metrics_dispatch import metrics_dispatch, write_typed_sinks
from .body import normalize_body
from .text_analysis import (
    LangIdActor,
    fingerprint_batch,
    lang_id_stage,
    quality_score_batch,
    token_count_batch,
)
from .dedup_docs import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .similarity import brute_force_topk, lsh_topk
from .multimodal import MediaDecodeActor, decode_stage, synthesize_media_batch
from .kafka_records import build_kafka_records, kafka_record_drops
from .tailsampling import (
    AlwaysSamplePolicy,
    AndPolicy,
    LatencyPolicy,
    NumericAttributePolicy,
    ProbabilisticPolicy,
    SpanCountPolicy,
    StatusCodePolicy,
    StringAttributePolicy,
    rate_limit_sample,
    tail_sample,
)

__all__ = [
    "PROCESSING_TS", "parse_batch", "parse_stage",
    "EnrichActor", "ROLE_CLASS", "TOOL_INFO", "enrich_stage",
    "ROUTED_SCHEMA", "Router", "route_stage",
    "finalize_routed",
    "sink_counts",
    "pack_envelopes",
    "DEFAULT_LATENCY_BOUNDS", "edge_table", "latency_histogram", "red_metrics",
    "hash_sample", "resource_dedup", "topology_collections", "usage_bytes",
    "metrics_dispatch", "write_typed_sinks",
    "normalize_body",
    "LangIdActor", "fingerprint_batch", "lang_id_stage",
    "quality_score_batch", "token_count_batch",
    "embedding_neardup_pairs", "exact_dedup", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash_pairs",
    "brute_force_topk", "lsh_topk",
    "MediaDecodeActor", "decode_stage", "synthesize_media_batch",
    "build_kafka_records", "kafka_record_drops",
    "tail_sample", "rate_limit_sample",
    "AlwaysSamplePolicy", "AndPolicy", "LatencyPolicy", "NumericAttributePolicy",
    "ProbabilisticPolicy", "SpanCountPolicy", "StatusCodePolicy",
    "StringAttributePolicy",
]
