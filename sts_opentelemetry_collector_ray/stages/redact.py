"""PII-style text redaction: sequential regex rewrite + per-category counts.

The reference strips sensitive RESOURCE ATTRIBUTES by key (M13 —
sts_usage/ottl strip, see stages/parse.py:37); this stage is the text-level
counterpart a training-data pipeline needs: scrub free text with an ordered
list of (category, pattern, replacement) rules before the corpus leaves the
pipeline. Patterns are RE2 on both sides of the oracle (Arrow and DuckDB both
embed RE2), so ``pc.replace_substring_regex`` and DuckDB
``regexp_replace(..., 'g')`` rewrite byte-identically, including ``\\1``
group references.

Semantics (mirrored exactly by the SQL oracle):

- counts are measured on the ORIGINAL text per category (well-defined even
  when categories overlap, e.g. digits inside a call argument);
- replacements apply SEQUENTIALLY in rule order, each over the previous
  rule's output — order matters and is part of the contract.

Vectorized end to end: one ``count_substring_regex`` + one
``replace_substring_regex`` kernel call per rule per batch; stateless task
stage (compiled-regex caching happens inside Arrow's kernel).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Default ruleset: classic PII shapes plus the transcript-specific
# tool-call-argument scrub (call args are user payloads in this data model).
DEFAULT_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("call_arg", r"call:([a-z]+)\(([^)]*)\)", r"call:\1(<ARG>)"),
    ("number", r"[0-9]+", "<NUM>"),
]


def redact_batch(
    t: pa.Table,
    col: str = "text",
    rules: list[tuple[str, str, str]] = DEFAULT_RULES,
) -> pa.Table:
    text = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
    text = pc.fill_null(text, "")
    out = t
    for name, pat, _ in rules:
        out = out.append_column(
            f"n_{name}", pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        )
    red = text
    for _, pat, rep in rules:
        red = pc.replace_substring_regex(red, pat, rep)
    return out.append_column("redacted", red)


def redact_stage(
    ds: "ray.data.Dataset",
    col: str = "text",
    rules: list[tuple[str, str, str]] = DEFAULT_RULES,
) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: redact_batch(t, col=col, rules=rules), batch_format="pyarrow"
    )
