from .parse import PROCESSING_TS, parse_batch, parse_stage
from .enrich import EnrichActor, ROLE_CLASS, TOOL_INFO, enrich_stage
from .route import ROUTED_SCHEMA, Router, route_stage
from .dedup import dedup_first_wins
from .aggregate import sink_counts

__all__ = [
    "PROCESSING_TS",
    "parse_batch",
    "parse_stage",
    "EnrichActor",
    "ROLE_CLASS",
    "TOOL_INFO",
    "enrich_stage",
    "ROUTED_SCHEMA",
    "Router",
    "route_stage",
    "dedup_first_wins",
    "sink_counts",
]
