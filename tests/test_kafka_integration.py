"""Real-broker Kafka integration suite — reference parity for the
dockerized scenarios in /root/reference/test/test_sink_integration.py:57-146
and test_source_integration.py:42-67.

Opt-in: requires BOTH a reachable broker (PYCONNECT_KAFKA_BOOTSTRAP env,
e.g. "localhost:9092" — the reference's docker-compose.yml brings one up)
AND the spark-sql-kafka-0-10 jar on the session classpath (add
org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> to
spark.jars.packages). Without either, every test here SKIPS cleanly; with
both, they run unchanged — the connector code path is byte-identical to
the file-transport tests (S01-S03), only read_stream/writer options
differ, which is the point of the transport abstraction.
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyconnect_spark.config import SinkConfig, SourceConfig
from pyconnect_spark.streaming.kafka import (
    KafkaSource,
    kafka_available,
    kafka_sink_stream,
)
from pyconnect_spark.streaming.sink import SparkSink

BOOTSTRAP = os.environ.get("PYCONNECT_KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.integration


@pytest.fixture(scope="module")
def broker(spark):
    if not BOOTSTRAP:
        pytest.skip("no broker: set PYCONNECT_KAFKA_BOOTSTRAP=host:port")
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka-0-10 jar not on classpath")
    return BOOTSTRAP


RECORDS = [(f"key_{i}", f"value_{i}") for i in range(20)]


def _source_cfg(tmp, topic):
    return SourceConfig(
        {
            "bootstrap_servers": BOOTSTRAP,
            "schema_registry": "http://localhost:8081",
            "topic": topic,
            "offset_topic": f"{topic}-offsets",
            "checkpoint_location": os.path.join(tmp, "src-ckpt"),
        }
    )


def _sink_cfg(tmp, topic, gid):
    return SinkConfig(
        {
            "bootstrap_servers": BOOTSTRAP,
            "schema_registry": "http://localhost:8081",
            "group_id": gid,
            "topics": topic,
            "checkpoint_location": os.path.join(tmp, f"ckpt-{gid}"),
        }
    )


class KafkaTestSink(SparkSink):
    """PyConnectTestSink analogue on the Kafka transport: collects flushed
    records into memory (reference test/utils.py:244-302)."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.flushed: list[tuple[str, str]] = []

    def read_stream(self):
        return kafka_sink_stream(self.spark, self.config)

    def on_flush(self, batch, epoch_id):
        self.flushed += [(r["key"], r["value"]) for r in batch.select("key", "value").collect()]


def _produce(spark, tmp, topic, records):
    """Seed the topic via the batch Kafka producer (same options builder
    the KafkaSource streaming path uses)."""
    from pyconnect_spark.streaming.kafka import source_writer_options

    df = spark.createDataFrame(records, "key string, value string")
    writer = df.selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
    ).write.format("kafka")
    for k, v in source_writer_options(_source_cfg(tmp, topic)).items():
        writer = writer.option(k, v)
    writer.save()


def test_k01_message_consumption(spark, broker, tmp_path):
    """reference test_sink_integration.py:57-62: everything produced is
    flushed exactly as sent."""
    tmp = str(tmp_path)
    topic = f"pc-it-{uuid.uuid4().hex[:8]}"
    _produce(spark, tmp, topic, RECORDS)
    sink = KafkaTestSink(spark, _sink_cfg(tmp, topic, "g1"))
    sink.run()
    assert sorted(sink.flushed) == sorted(RECORDS)


def test_k02_offset_commit_on_restart(spark, broker, tmp_path):
    """reference test_sink_integration.py:66-89: a second run with the
    same group/checkpoint consumes only records produced after the first."""
    tmp = str(tmp_path)
    topic = f"pc-it-{uuid.uuid4().hex[:8]}"
    _produce(spark, tmp, topic, RECORDS[:10])
    cfg = _sink_cfg(tmp, topic, "g2")
    first = KafkaTestSink(spark, cfg)
    first.run()
    assert sorted(first.flushed) == sorted(RECORDS[:10])

    _produce(spark, tmp, topic, RECORDS[10:])
    second = KafkaTestSink(spark, cfg)  # same checkpoint = committed offsets
    second.run()
    assert sorted(second.flushed) == sorted(RECORDS[10:])


def test_k03_continue_after_crash(spark, broker, tmp_path):
    """reference test_sink_integration.py:92-108: a flush crash prevents
    the offset commit; restart replays, nothing is lost (at-least-once)."""
    from pyconnect_spark.streaming.core import PyConnectError

    tmp = str(tmp_path)
    topic = f"pc-it-{uuid.uuid4().hex[:8]}"
    _produce(spark, tmp, topic, RECORDS)
    cfg = _sink_cfg(tmp, topic, "g3")

    class CrashingSink(KafkaTestSink):
        def on_flush(self, batch, epoch_id):
            super().on_flush(batch, epoch_id)
            raise RuntimeError("crash AFTER flush, BEFORE commit")

    crashing = CrashingSink(spark, cfg)
    with pytest.raises(PyConnectError):
        crashing.run()

    survivor = KafkaTestSink(spark, cfg)
    survivor.run()
    # union of both flush logs covers every record (duplicates allowed)
    assert set(crashing.flushed) | set(survivor.flushed) == set(RECORDS)


def test_k04_resume_producing(spark, broker, tmp_path):
    """reference test_source_integration.py:55-67: a KafkaSource restarted
    on the same checkpoint publishes only unseen records."""
    tmp = str(tmp_path)
    topic = f"pc-it-{uuid.uuid4().hex[:8]}"
    staging = os.path.join(tmp, "staging")
    os.makedirs(staging)
    ckpt = os.path.join(tmp, "src-ckpt")

    import json as _json

    def stage(records, fname):
        with open(os.path.join(staging, fname), "w") as f:
            for k, v in records:
                f.write(_json.dumps({"key": k, "value": v}) + "\n")

    stage(RECORDS[:10], "a.jsonl")
    stream = spark.readStream.schema("key string, value string").json(staging)
    KafkaSource(spark, _source_cfg(tmp, topic), stream, checkpoint=ckpt).run()
    stage(RECORDS[10:], "b.jsonl")
    KafkaSource(spark, _source_cfg(tmp, topic), stream, checkpoint=ckpt).run()

    drained = KafkaTestSink(spark, _sink_cfg(tmp, topic, "g4"))
    drained.run()
    assert sorted(drained.flushed) == sorted(RECORDS)
