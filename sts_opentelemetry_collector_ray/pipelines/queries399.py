"""Driver-contract queries, wave 399 — K1 keyed-sink RECORD semantics
(tombstones + per-record topic override), mirroring
stskafkaexporter/exporter.go:166-268 and
topologyconnector/metadata_publisher.go:144-176. Record attributes are
derived deterministically from `events` so the DuckDB oracle replays the
derivation byte-for-byte. Same contract as queries.py: column names AND
dtypes match the oracle exactly."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES399: dict[str, str] = {}

_DEFAULT_TOPIC = "sts-internal-telemetry"
_OVERRIDE_TOPIC = "sts-snapshots"


def _record_source(sf_dir: str) -> "ray.data.Dataset":
    """events → log-record analogue with (msg_key, msg_topic, payload):
    - key missing (NULL) when event_id % 17 == 0   → build error, dropped
    - topic override on event_id % 5 == 0          → routed to _OVERRIDE_TOPIC
    - body NULL when event_id % 11 == 0            → unsupported type, dropped
    - body '' when event_id % 7 == 0               → TOMBSTONE (value=NULL)
    Precedence (11 before 7) matches the oracle CASE order."""

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"]
        ev = eid.to_numpy(zero_copy_only=False)
        sid = pc.cast(eid, pa.string())
        key = pc.if_else(
            pa.array(ev % 17 == 0),
            pa.scalar(None, pa.string()),
            pc.binary_join_element_wise("k", sid, ""),
        )
        topic = pc.if_else(
            pa.array(ev % 5 == 0),
            pa.scalar(_OVERRIDE_TOPIC, pa.string()),
            pa.scalar(None, pa.string()),
        )
        payload = pc.if_else(
            pa.array(ev % 11 == 0),
            pa.scalar(None, pa.string()),
            pc.if_else(
                pa.array(ev % 7 == 0),
                pa.scalar("", pa.string()),
                pc.binary_join_element_wise(t["event_type"], sid, ":"),
            ),
        )
        return pa.table({"msg_key": key, "msg_topic": topic, "payload": payload})

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )
    return ds.map_batches(derive, batch_format="pyarrow")


_SRC_SQL = f"""
SELECT CASE WHEN event_id % 17 = 0 THEN NULL
            ELSE 'k' || CAST(event_id AS VARCHAR) END AS msg_key,
       CASE WHEN event_id % 5 = 0 THEN '{_OVERRIDE_TOPIC}' ELSE NULL END AS msg_topic,
       CASE WHEN event_id % 11 = 0 THEN NULL
            WHEN event_id % 7 = 0 THEN ''
            ELSE event_type || ':' || CAST(event_id AS VARCHAR) END AS payload
FROM events"""


def q_kafka_records(sf_dir: str):
    """Keyed-sink record build: required key, per-record topic override, empty
    body ⇒ tombstone (value=NULL), NULL body ⇒ dropped
    (stages/kafka_records.py::build_kafka_records; exporter.go:166-268)."""
    from ..stages.kafka_records import build_kafka_records

    return build_kafka_records(_record_source(sf_dir), default_topic=_DEFAULT_TOPIC)


ORACLES399["kafka_records"] = f"""
WITH src AS ({_SRC_SQL})
SELECT coalesce(msg_topic, '{_DEFAULT_TOPIC}') AS topic, msg_key,
       CASE WHEN payload = '' THEN NULL ELSE payload END AS value,
       (payload = '') AS tombstone
FROM src WHERE msg_key IS NOT NULL AND payload IS NOT NULL"""


def q_kafka_record_drops(sf_dir: str):
    """Per-topic drop accounting for records the build skips — the batch
    analogue of the reference's "partial logs dropped" warning; missing_key
    precedes unsupported_body as in extractMessageKey-before-extractMessageValue
    (stages/kafka_records.py::kafka_record_drops)."""
    from ..stages.kafka_records import kafka_record_drops

    return kafka_record_drops(_record_source(sf_dir), default_topic=_DEFAULT_TOPIC)


ORACLES399["kafka_record_drops"] = f"""
WITH src AS ({_SRC_SQL})
SELECT coalesce(msg_topic, '{_DEFAULT_TOPIC}') AS topic,
       CASE WHEN msg_key IS NULL THEN 'missing_key' ELSE 'unsupported_body' END AS reason,
       count(*) AS n
FROM src WHERE msg_key IS NULL OR payload IS NULL
GROUP BY 1, 2"""


QUERIES399 = {
    "kafka_records": q_kafka_records,
    "kafka_record_drops": q_kafka_record_drops,
}
