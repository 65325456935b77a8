"""K1 record semantics — tombstones + per-record topic override
(stskafkaexporter/exporter.go:166-268, metadata_publisher.go:144-176)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from sts_opentelemetry_collector_ray.stages.kafka_records import (
    build_kafka_records,
    kafka_record_drops,
)


def _src():
    return ray.data.from_arrow(
        pa.table(
            {
                "msg_key": ["a", "b", None, "d", "e"],
                "msg_topic": [None, "override-topic", None, None, "override-topic"],
                "payload": ["v1", "v2", "v3", "", None],
            }
        )
    )


def test_build_kafka_records_semantics(ray_session):
    out = (
        build_kafka_records(_src(), default_topic="base-topic")
        .to_pandas()
        .sort_values("msg_key")
        .reset_index(drop=True)
    )
    # NULL key (row 3) and NULL body (row 5) dropped; others kept
    assert out["msg_key"].tolist() == ["a", "b", "d"]
    assert out["topic"].tolist() == ["base-topic", "override-topic", "base-topic"]
    # empty body → tombstone with NULL value (the compaction delete marker)
    assert out["tombstone"].tolist() == [False, False, True]
    assert out["value"].tolist()[:2] == ["v1", "v2"]
    assert pd.isna(out["value"].iloc[2])


def test_kafka_record_drops_accounting(ray_session):
    out = (
        kafka_record_drops(_src(), default_topic="base-topic")
        .to_pandas()
        .sort_values(["topic", "reason"])
        .reset_index(drop=True)
    )
    # row 3: missing key on default topic; row 5: unsupported body on override
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("base-topic", "missing_key", 1),
        ("override-topic", "unsupported_body", 1),
    ]


def test_tombstone_rows_land_in_hive_layout(ray_session, tmp_path):
    """The record stream lands via RoutedParquetDatasink partitioned by topic;
    a tombstone row survives as (msg_key, value=NULL, tombstone=true) inside
    its topic directory — the batch analogue of a nil-value compacted record."""
    from sts_opentelemetry_collector_ray.sinks import RoutedParquetDatasink

    root = str(tmp_path / "records")
    sink = RoutedParquetDatasink(
        root, partition_cols=("topic",), count_keys=("tombstone",), key_col="msg_key"
    )
    build_kafka_records(_src(), default_topic="base-topic").write_datasink(sink)
    assert sink.rows_written == 3
    dirs = sorted(os.listdir(root))
    assert dirs == ["topic=base-topic", "topic=override-topic"]
    base = pq.read_table(os.path.join(root, "topic=base-topic")).to_pandas()
    base = base.sort_values("msg_key").reset_index(drop=True)
    assert base["msg_key"].tolist() == ["a", "d"]
    assert base["tombstone"].tolist() == [False, True]
    assert pd.isna(base["value"].iloc[1])  # delete marker: NULL value persisted
    # piggybacked counts still work keyed on the tombstone flag
    cnt = sink.agg_counts.to_pandas().sort_values("tombstone").reset_index(drop=True)
    assert cnt["n"].tolist() == [2, 1]


def test_empty_input_edge_cases(ray_session):
    """Empty input must flow cleanly through both operators (groupby on an
    empty dataset yields schema-less blocks; the per-batch rename tolerates
    them where Dataset.rename_columns would crash on a None schema)."""
    ek = pa.table(
        {
            "msg_key": pa.array([], pa.string()),
            "msg_topic": pa.array([], pa.string()),
            "payload": pa.array([], pa.string()),
        }
    )
    assert build_kafka_records(ray.data.from_arrow(ek)).count() == 0
    assert kafka_record_drops(ray.data.from_arrow(ek)).count() == 0
