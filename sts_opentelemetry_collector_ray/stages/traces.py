"""ClickHouse-analog traces sink with NESTED Events/Links columns (K2).

The reference's traces table carries ``Events Nested(Timestamp, Name,
Attributes)`` and ``Links Nested(TraceId, SpanId, TraceState, Attributes)``
(reference: exporter/clickhousestsexporter/exporter_traces.go:233-249; insert
269-275; row building 134-167, convertEvents 180-195 / convertLinks 197-210;
SpanParentType derivation getSpanParentType 82-103). The repo's routed sink is
deliberately flat (SURVEY §1.5); this stage is the nested-first traces table a
span-events consumer needs, expressed as ``pa.list_(pa.struct(...))`` columns
built entirely from Arrow kernels (split → flatten → reduceat; no per-row
Python on the batch path).

Span derivation over the transcript data model (turn == span):

- trace = conversation, span id = ``conv/turn``; turn 0 is the trace root and
  later turns parent on the previous turn (ParentSpanId, exporter_traces.go:144)
- span events = ``attr.k=v`` tokens of the turn text, one event per token with
  a one-entry attribute map (convertEvents: per-event Attributes map)
- span links = previous-turn link (+ a trace-root link past turn 1) — the
  multi-element case (convertLinks)
- attribute maps are canonical JSON strings inside the nested structs — the
  repo's established Map(String,String) translation.

``traces_flatten_json`` projects the nested columns to canonical JSON strings
so the DuckDB oracle can compare values row-for-row (the driver gate sorts
pandas frames, where raw list<struct> cells don't order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SPAN_STRUCT_EVENT = pa.struct(
    [("event_ts", pa.timestamp("us")), ("name", pa.string()), ("attributes", pa.string())]
)
SPAN_STRUCT_LINK = pa.struct(
    [
        ("trace_id", pa.string()),
        ("span_id", pa.string()),
        ("trace_state", pa.string()),
        ("attributes", pa.string()),
    ]
)

TRACES_SCHEMA = pa.schema(
    [
        ("ts", pa.timestamp("us")),
        ("trace_id", pa.string()),
        ("span_id", pa.string()),
        ("parent_span_id", pa.string()),
        ("trace_state", pa.string()),
        ("span_name", pa.string()),
        ("span_kind", pa.string()),
        ("service_name", pa.string()),
        ("scope_name", pa.string()),
        ("scope_version", pa.string()),
        ("span_attributes", pa.string()),  # canonical JSON map
        ("duration_ns", pa.int64()),
        ("status_code", pa.string()),
        ("status_message", pa.string()),
        ("span_parent_type", pa.string()),
        ("events", pa.list_(SPAN_STRUCT_EVENT)),
        ("links", pa.list_(SPAN_STRUCT_LINK)),
    ]
)

_ATTR_TOKEN_RE = r"^attr\.(?P<k>[^=]*)(?:=(?P<v>.*))?$"


def _str(col) -> pa.Array:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return col


def _events_arrays(text: pa.Array, ts_us: np.ndarray):
    """Vectorized span-event extraction: split on ' ' → flatten → mask tokens
    starting with 'attr.' → regex k/v split — one kernel call each, row
    membership recovered from list offsets (reduceat pattern)."""
    toks = pc.split_pattern(pc.fill_null(text, ""), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    is_attr = pc.starts_with(flat, "attr.").to_numpy(zero_copy_only=False)
    match_counts = np.zeros(len(counts), dtype=np.int64)
    nz = counts > 0
    if nz.any() and len(is_attr):
        starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]]).astype(np.int64)
        match_counts[nz] = np.add.reduceat(is_attr.astype(np.int64), starts)
    sel = flat.filter(pa.array(is_attr))
    kv = pc.extract_regex(sel, _ATTR_TOKEN_RE)
    keys = pc.struct_field(kv, "k")
    vals = pc.fill_null(pc.struct_field(kv, "v"), "")
    attr_json = pc.binary_join_element_wise(
        '{"', keys, '":"', vals, '"}', ""
    )
    # event timestamps: span ts + (position-within-row + 1) ms
    row_idx = np.repeat(np.arange(len(counts)), match_counts)
    starts_all = np.concatenate([[0], np.cumsum(match_counts)[:-1]]).astype(np.int64)
    pos = np.arange(int(match_counts.sum())) - np.repeat(starts_all, match_counts)
    ev_ts = ts_us[row_idx] + (pos + 1) * 1000
    offsets = np.concatenate([[0], np.cumsum(match_counts)]).astype(np.int32)
    child = pa.StructArray.from_arrays(
        [pa.array(ev_ts).cast(pa.timestamp("us")), keys, attr_json],
        fields=list(SPAN_STRUCT_EVENT),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child), match_counts


def _links_arrays(conv: np.ndarray, span_prev: np.ndarray, root: np.ndarray, t: np.ndarray):
    """Links: [previous-turn] for every non-root span, plus [trace-root] past
    turn 1 — built by positional assignment into flat child arrays."""
    has_prev = t > 0
    has_root = t > 1
    counts = has_prev.astype(np.int64) + has_root.astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    total = int(counts.sum())
    c_trace = np.empty(total, dtype=object)
    c_span = np.empty(total, dtype=object)
    c_attr = np.empty(total, dtype=object)
    pos_prev = offsets[:-1][has_prev]
    pos_root = offsets[:-1][has_root] + 1
    c_trace[pos_prev] = conv[has_prev]
    c_span[pos_prev] = span_prev[has_prev]
    c_attr[pos_prev] = '{"link.type":"prev-turn"}'
    c_trace[pos_root] = conv[has_root]
    c_span[pos_root] = root[has_root]
    c_attr[pos_root] = '{"link.type":"trace-root"}'
    child = pa.StructArray.from_arrays(
        [
            pa.array(c_trace, pa.string()),
            pa.array(c_span, pa.string()),
            pa.array(np.full(total, "", dtype=object), pa.string()),
            pa.array(c_attr, pa.string()),
        ],
        fields=list(SPAN_STRUCT_LINK),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)


def spans_batch(t: pa.Table) -> pa.Table:
    """One traces-table row per parsed turn (exporter_traces.go:134-167)."""
    n = t.num_rows
    conv = _str(t["conv_id"])
    turn = _str(t["turn_idx"])
    role = _str(t["role"])
    tool = pc.fill_null(_str(t["tool"]), "")
    sev = _str(t["severity"])
    text = pc.fill_null(_str(t["text"]), "")
    ts = _str(t["ts"])
    turn_s = pc.cast(turn, pa.string())
    span_id = pc.binary_join_element_wise(conv, "/", turn_s, "")
    prev_s = pc.cast(pc.subtract(turn, pa.scalar(1, turn.type)), pa.string())
    span_prev = pc.binary_join_element_wise(conv, "/", prev_s, "")
    root_id = pc.binary_join_element_wise(conv, "/0", "")
    t_np = turn.to_numpy(zero_copy_only=False).astype(np.int64)
    is_root = pa.array(t_np == 0)
    parent = pc.if_else(is_root, pa.scalar(""), span_prev)
    kind = pc.if_else(
        pc.equal(role, "tool"),
        pa.scalar("SPAN_KIND_CLIENT"),
        pc.if_else(
            pc.equal(role, "user"),
            pa.scalar("SPAN_KIND_SERVER"),
            pa.scalar("SPAN_KIND_INTERNAL"),
        ),
    )
    # getSpanParentType (exporter_traces.go:82-103): empty parent → ROOT,
    # SERVER/CONSUMER kinds → EXTERNAL, everything else → INTERNAL
    parent_type = pc.if_else(
        is_root,
        pa.scalar("SPAN_PARENT_TYPE_ROOT"),
        pc.if_else(
            pc.equal(kind, "SPAN_KIND_SERVER"),
            pa.scalar("SPAN_PARENT_TYPE_EXTERNAL"),
            pa.scalar("SPAN_PARENT_TYPE_INTERNAL"),
        ),
    )
    service = pc.if_else(pc.equal(tool, ""), pa.scalar("conversation"), tool)
    is_err = pc.equal(sev, "ERROR")
    status_code = pc.if_else(
        is_err, pa.scalar("STATUS_CODE_ERROR"), pa.scalar("STATUS_CODE_UNSET")
    )
    status_msg = pc.if_else(is_err, text, pa.scalar(""))
    # span attributes: sorted-key canonical JSON (role < severity < tool)
    attrs = pc.binary_join_element_wise(
        '{"role":"', role, '","severity":"', sev, '"', ""
    )
    attrs = pc.if_else(
        pc.equal(tool, ""),
        pc.binary_join_element_wise(attrs, "}", ""),
        pc.binary_join_element_wise(attrs, ',"tool":"', tool, '"}', ""),
    )
    duration = pc.multiply(
        pc.cast(pc.utf8_length(text), pa.int64()), pa.scalar(1000, pa.int64())
    )
    ts_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    events, _ = _events_arrays(text, ts_us)
    links = _links_arrays(
        conv.to_numpy(zero_copy_only=False),
        span_prev.to_numpy(zero_copy_only=False),
        root_id.to_numpy(zero_copy_only=False),
        t_np,
    )
    return pa.table(
        {
            "ts": ts,
            "trace_id": conv,
            "span_id": span_id,
            "parent_span_id": parent,
            "trace_state": pa.array([""] * n, pa.string()),
            "span_name": role,
            "span_kind": kind,
            "service_name": service,
            "scope_name": pa.array(["transcripts"] * n, pa.string()),
            "scope_version": pa.array(["1.0"] * n, pa.string()),
            "span_attributes": attrs,
            "duration_ns": duration,
            "status_code": status_code,
            "status_message": status_msg,
            "span_parent_type": parent_type,
            "events": events,
            "links": links,
        }
    )


def traces_table(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Parsed turns → nested traces table (the ClickHouse sink analogue)."""
    return parsed.map_batches(spans_batch, batch_format="pyarrow")


def _join_json(lst: pa.ListArray, child_json: pa.Array) -> pa.Array:
    """list<struct> → canonical JSON array string, reusing the list's offsets
    over per-child JSON strings (pc.binary_join; no per-row Python)."""
    rebuilt = pa.ListArray.from_arrays(lst.offsets, child_json)
    joined = pc.binary_join(rebuilt, pa.scalar(","))
    return pc.binary_join_element_wise("[", pc.fill_null(joined, ""), "]", "")


def flatten_json_batch(t: pa.Table) -> pa.Table:
    events = _str(t["events"])
    links = _str(t["links"])
    ev = events.flatten()
    ev_json = pc.binary_join_element_wise(
        '{"attributes":',
        ev.field("attributes"),
        ',"name":"',
        ev.field("name"),
        '","ts":',
        pc.cast(ev.field("event_ts").cast(pa.int64()), pa.string()),
        "}",
        "",
    )
    ln = links.flatten()
    ln_json = pc.binary_join_element_wise(
        '{"attributes":',
        ln.field("attributes"),
        ',"span_id":"',
        ln.field("span_id"),
        '","trace_id":"',
        ln.field("trace_id"),
        '","trace_state":"',
        ln.field("trace_state"),
        '"}',
        "",
    )
    out = t.drop_columns(["events", "links"])
    out = out.append_column("events_json", _join_json(events, ev_json))
    out = out.append_column("links_json", _join_json(links, ln_json))
    return out


def traces_flatten_json(traces: "ray.data.Dataset") -> "ray.data.Dataset":
    return traces.map_batches(flatten_json_batch, batch_format="pyarrow")
