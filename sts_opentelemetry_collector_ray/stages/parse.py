"""Parse stage — vectorized grok/regex extraction over the `text` column.

The analogue of the reference's per-element attribute extraction + log-body
normalization + timestamp coalescing (reference:
connector/topologyconnector/internal/model.go:147-201 — body polymorphism with string
fallback; signal_traverser.go:111-131 — per-element collection timestamp with
processing-time fallback; mapping.go:181-245 — cached-regex extraction).

All extraction is `pyarrow.compute` (RE2) over zero-copy Arrow string columns:

- ``severity``   — ``^\\[SEV\\]`` prefix, fallback ``'UNKNOWN'`` (body-fallback path)
- ``tool_sig`` / ``tool_name`` / ``call_arg`` — ``call:<tool>(<arg>)`` signatures
- ``attrs``      — ``k=v`` span-like attribute pairs as a map column (only rows that
  contain attributes are visited by the per-row fallback loop; the mask itself is
  vectorized)
- ``ts_eff``     — null timestamps coalesced to a fixed processing timestamp
  (deterministic analogue of "collector receipt time")

DuckDB-oracle equivalents (same RE2 dialect) live in `__ray_entry__.oracle_sql`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Deterministic processing-time fallback (the reference stamps `now` per batch,
# signal_traverser.go:111-119; a fixed instant keeps runs byte-identical).
PROCESSING_TS = pa.scalar(0, pa.timestamp("us"))  # 1970-01-01T00:00:00

SEVERITY_PATTERN = r"^\[(?P<sev>[A-Z]+)\]"
CALL_PATTERN = r"call:(?P<toolname>[a-z]+)\((?P<arg>[^)]*)\)"
ATTR_PATTERN = r"(attr\.[A-Za-z0-9_.]+)=(\S+)"


def _extract_attrs(text_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """k=v attribute pairs → map<string,string>. Vectorized pre-mask; the row loop
    only touches rows that actually contain `attr.` tokens (~a third of synthetic
    rows, none of the events-derived rows).

    Sensitive routing keys are deleted at construction, BEFORE any rule can see
    them — the reference strips sts_api_key/client_sts_api_key/server_sts_api_key
    when building the attribute views (model.go:23-28)."""
    import re

    from ..rules.model import SENSITIVE_ATTRS

    pat = re.compile(ATTR_PATTERN)
    has = pc.match_substring(text_col, "attr.")
    out: list[list[tuple[str, str]] | None] = [None] * len(text_col)
    if pc.any(has).as_py():
        texts = text_col.to_pylist()
        flags = has.to_pylist()
        for i, (t, f) in enumerate(zip(texts, flags)):
            if f and t is not None:
                out[i] = [
                    (k, v)
                    for k, v in pat.findall(t)
                    if k.split("attr.", 1)[-1] not in SENSITIVE_ATTRS
                ]
    return pa.array(out, pa.map_(pa.string(), pa.string()))


def parse_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    sev = pc.extract_regex(text, SEVERITY_PATTERN)
    severity = pc.coalesce(pc.struct_field(sev, "sev"), pa.scalar("UNKNOWN"))
    call = pc.extract_regex(text, CALL_PATTERN)
    tool_name = pc.struct_field(call, "toolname")
    arg = pc.struct_field(call, "arg")
    # Reconstruct the full matched signature from its groups (pattern is exact).
    tool_sig = pc.binary_join_element_wise(
        pc.binary_join_element_wise("call:", tool_name, ""),
        pc.binary_join_element_wise("(", arg, ")", ""),
        "",
    )
    ts_eff = pc.coalesce(batch["ts"], PROCESSING_TS) if "ts" in batch.column_names else None
    out = batch.append_column("severity", severity)
    out = out.append_column("tool_sig", tool_sig)
    out = out.append_column("tool_name", tool_name)
    out = out.append_column("call_arg", arg)
    out = out.append_column("attrs", _extract_attrs(text))
    if ts_eff is not None:
        out = out.append_column("ts_eff", ts_eff)
    return out


def parse_stage(ds: "ray.data.Dataset", batch_size: int = 32_768) -> "ray.data.Dataset":
    return ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=batch_size)
