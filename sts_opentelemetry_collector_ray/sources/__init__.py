from .transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    TRANSCRIPT_SCHEMA,
    derive_transcripts_from_events,
    generate_transcripts,
    read_transcripts,
    transcripts_path_for,
)

__all__ = [
    "TRANSCRIPTS_FROM_EVENTS_SQL",
    "TRANSCRIPT_SCHEMA",
    "derive_transcripts_from_events",
    "generate_transcripts",
    "read_transcripts",
    "transcripts_path_for",
]
