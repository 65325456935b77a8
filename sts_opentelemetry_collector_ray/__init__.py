"""sts_opentelemetry_collector_ray — a Ray-Data-native data-processing engine with the query and
transform capabilities of StackVista/sts-opentelemetry-collector.

The reference is a streaming OpenTelemetry Collector distribution (Go): YAML-wired
receivers → processors → connectors → exporters, whose core loop is
traverse → evaluate CEL conditions → project to output rows → dedup → group by
partition key → publish (see /root/repo/SURVEY.md). This package re-expresses that
receive → process → route → export semantics as `ray.data.Dataset` pipelines of
vectorized `map_batches` over zero-copy Arrow batches:

- `sources/`   — parquet readers + the deterministic transcript corpus
- `stages/`    — parse (grok/regex), enrich (actor-pool lookups), route (rules),
                 dedup, aggregate, envelope packing, service-graph join,
                 text analysis / dedup family / similarity search for training data
- `rules/`     — the rule model + CEL-lite expression compiler
- `functions/` — scalar function library (hashing, urn templating, map ops)
- `pipelines/` — end-to-end flagship pipeline with checkpoint manifests
- `state/`     — per-partition lineage manifests (idempotent resume)
"""

SHARD_COUNT = 4  # reference: connector/topologyconnector/internal/message_builder.go:14-19
ENVELOPE_MAX_BYTES = 768 * 1024  # message_builder.go:162-171


def _stub_fsspec_http() -> None:
    """Ray Data's path resolution imports ``fsspec.implementations.http`` on every
    read/write plan. Without aiohttp that import always fails — harmless alone
    (ModuleNotFoundError is caught), but concurrent plans (overlapped partition
    pipelines) re-execute the failing import in parallel and surface a plain
    ImportError that Ray does not catch. Pre-seeding a stub module with a dummy
    HTTPFileSystem makes the import succeed; Ray only isinstance-checks against
    it, which is correctly False for every real filesystem here."""
    import sys

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import types

        mod = types.ModuleType(name)
        mod.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules[name] = mod


_stub_fsspec_http()
