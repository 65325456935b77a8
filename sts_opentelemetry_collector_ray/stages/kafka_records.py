"""K1 record semantics — the keyed-sink record builder with tombstones and
per-record topic overrides.

Mirrors ``stskafkaexporter/exporter.go:166-268`` (``buildKafkaRecords`` /
``extractMessageKey`` / ``extractMessageValue``):

- the message key attribute is REQUIRED — a record without one fails to build
  and is dropped (the reference keeps every other record and logs "partial
  logs dropped" with the first error);
- the topic defaults to the exporter config but a per-record topic attribute
  (``KafkaMessageTopic``) overrides it — the metadata publisher uses this to
  route settings snapshots to a different topic than the stream records
  (``topologyconnector/metadata_publisher.go:144-176``);
- an EMPTY body produces a nil value — a Kafka TOMBSTONE, the delete marker
  compaction uses to drop the key (``extractMessageValue``); a body that is
  not bytes (here: NULL) is "unsupported log record body type" and the record
  is dropped.

Batch translation: both functions are single ``map_batches`` over zero-copy
Arrow — pure column kernels, no shuffle, trivially 100 TB-safe. The record
stream then lands in the hive layout via ``RoutedParquetDatasink`` partitioned
by topic, where a tombstone row is (key, value=NULL, tombstone=true) — the
batch analogue of a nil-value record on a compacted topic.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_TOPIC = "sts-internal-telemetry"


def _prep(
    t: pa.Table, default_topic: str, key_col: str, topic_col: str, body_col: str
) -> tuple[pa.Table, "pa.ChunkedArray", "pa.ChunkedArray", "pa.ChunkedArray"]:
    key = t[key_col]
    body = t[body_col]
    topic = (
        pc.coalesce(t[topic_col], pa.scalar(default_topic, pa.string()))
        if topic_col in t.column_names
        else pa.chunked_array([pa.array([default_topic] * t.num_rows, pa.string())])
    )
    return t, key, body, topic


def build_kafka_records(
    ds,
    default_topic: str = DEFAULT_TOPIC,
    key_col: str = "msg_key",
    topic_col: str = "msg_topic",
    body_col: str = "payload",
):
    """Dataset of sink records (topic, msg_key, value, tombstone).

    - NULL key  → record dropped (missing required attribute)
    - NULL body → record dropped (unsupported body type)
    - empty body → kept with value=NULL, tombstone=true (delete marker)
    """

    def to_records(t: pa.Table) -> pa.Table:
        t, key, body, topic = _prep(t, default_topic, key_col, topic_col, body_col)
        keep = pc.and_(pc.is_valid(key), pc.is_valid(body))
        tomb = pc.equal(pc.utf8_length(pc.cast(body, pa.string())), 0)
        value = pc.if_else(tomb, pa.scalar(None, pa.string()), pc.cast(body, pa.string()))
        out = pa.table(
            {
                "topic": pc.cast(topic, pa.string()),
                "msg_key": pc.cast(key, pa.string()),
                "value": value,
                "tombstone": pc.fill_null(tomb, False),
            }
        )
        return out.filter(keep)

    return ds.map_batches(to_records, batch_format="pyarrow")


def kafka_record_drops(
    ds,
    default_topic: str = DEFAULT_TOPIC,
    key_col: str = "msg_key",
    topic_col: str = "msg_topic",
    body_col: str = "payload",
):
    """Per-topic drop accounting for the records ``build_kafka_records`` skips —
    the batch analogue of the reference's "partial logs dropped" warning
    (``ExportData``): (topic, reason, n) with reason ∈ {missing_key,
    unsupported_body}. Missing-key takes precedence (the reference fails on the
    key before ever reading the body)."""

    def drops(t: pa.Table) -> pa.Table:
        t, key, body, topic = _prep(t, default_topic, key_col, topic_col, body_col)
        no_key = pc.invert(pc.is_valid(key))
        no_body = pc.and_(pc.is_valid(key), pc.invert(pc.is_valid(body)))
        reason = pc.if_else(
            no_key,
            pa.scalar("missing_key", pa.string()),
            pc.if_else(no_body, pa.scalar("unsupported_body", pa.string()), pa.scalar(None, pa.string())),
        )
        sub = pa.table({"topic": pc.cast(topic, pa.string()), "reason": reason}).filter(
            pc.is_valid(reason)
        )
        return (
            sub.group_by(["topic", "reason"])
            .aggregate([([], "count_all")])
            .rename_columns(["topic", "reason", "n"])
        )

    # per-batch partial counts → tiny bounded groupby (topics × 2 reasons).
    # The rename runs per batch, not via Dataset.rename_columns: an all-empty
    # input leaves groupby().sum() schema-less and rename_columns crashes on
    # its None schema, while map_batches simply skips empty blocks.
    partial = ds.map_batches(drops, batch_format="pyarrow")
    return (
        partial.groupby(["topic", "reason"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["topic", "reason", "n"]),
            batch_format="pyarrow",
        )
    )
