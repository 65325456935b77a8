"""K2 nested traces sink: list<struct> Events/Links columns
(stages/traces.py; reference exporter_traces.go:214-302)."""

import pyarrow as pa

from sts_opentelemetry_collector_ray.stages.traces import (
    TRACES_SCHEMA,
    flatten_json_batch,
    spans_batch,
)


def _turns() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0], pa.int64()),
            "role": pa.array(["user", "assistant", "tool", "user"], pa.string()),
            "tool": pa.array([None, None, "search", None], pa.string()),
            "severity": pa.array(["INFO", "INFO", "ERROR", "INFO"], pa.string()),
            "text": pa.array(
                [
                    "hello attr.k=v world attr.flag",
                    "plain reply",
                    "boom attr.err=timeout",
                    None,
                ],
                pa.string(),
            ),
            "ts": pa.array([1_000_000, 2_000_000, 3_000_000, 9_000_000], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )


def test_spans_schema_is_nested():
    out = spans_batch(_turns())
    assert out.schema.equals(TRACES_SCHEMA)
    assert pa.types.is_list(out.schema.field("events").type)
    assert pa.types.is_struct(out.schema.field("events").type.value_type)
    assert pa.types.is_list(out.schema.field("links").type)


def test_span_derivation():
    out = spans_batch(_turns())
    assert out["span_id"].to_pylist() == ["c1/0", "c1/1", "c1/2", "c2/0"]
    assert out["parent_span_id"].to_pylist() == ["", "c1/0", "c1/1", ""]
    # role → kind; ERROR severity → status; tool → service (exporter row build)
    assert out["span_kind"].to_pylist() == [
        "SPAN_KIND_SERVER",
        "SPAN_KIND_INTERNAL",
        "SPAN_KIND_CLIENT",
        "SPAN_KIND_SERVER",
    ]
    assert out["span_parent_type"].to_pylist() == [
        "SPAN_PARENT_TYPE_ROOT",
        "SPAN_PARENT_TYPE_INTERNAL",
        "SPAN_PARENT_TYPE_INTERNAL",
        "SPAN_PARENT_TYPE_ROOT",
    ]
    assert out["service_name"].to_pylist() == [
        "conversation",
        "conversation",
        "search",
        "conversation",
    ]
    assert out["status_code"].to_pylist()[2] == "STATUS_CODE_ERROR"
    assert out["status_message"].to_pylist()[2] == "boom attr.err=timeout"
    assert out["duration_ns"].to_pylist()[3] == 0  # null text → empty


def test_events_extraction():
    out = spans_batch(_turns())
    ev = out["events"].to_pylist()
    assert [len(e) for e in ev] == [2, 0, 1, 0]
    first = ev[0][0]
    assert first["name"] == "k"
    assert first["attributes"] == '{"k":"v"}'
    # span ts + (pos+1) ms
    assert first["event_ts"].timestamp() == (1_000_000 + 1000) / 1e6
    assert ev[0][1]["name"] == "flag"
    assert ev[0][1]["attributes"] == '{"flag":""}'
    assert ev[2][0]["attributes"] == '{"err":"timeout"}'


def test_links_extraction():
    out = spans_batch(_turns())
    ln = out["links"].to_pylist()
    assert [len(l) for l in ln] == [0, 1, 2, 0]
    assert ln[1][0]["span_id"] == "c1/0"
    assert ln[1][0]["attributes"] == '{"link.type":"prev-turn"}'
    assert ln[2][0]["span_id"] == "c1/1"
    assert ln[2][1]["span_id"] == "c1/0"
    assert ln[2][1]["attributes"] == '{"link.type":"trace-root"}'
    assert all(l["trace_id"] == "c1" for l in ln[2])


def test_flatten_json_round_trip():
    import json

    out = flatten_json_batch(spans_batch(_turns()))
    assert "events" not in out.column_names and "links" not in out.column_names
    evj = out["events_json"].to_pylist()
    assert evj[1] == "[]" and evj[3] == "[]"
    parsed = json.loads(evj[0])
    assert [e["name"] for e in parsed] == ["k", "flag"]
    lnj = json.loads(out["links_json"].to_pylist()[2])
    assert [l["span_id"] for l in lnj] == ["c1/1", "c1/0"]
