"""Kafka + Confluent-Avro wiring for the connector framework.

This module builds the exact reader/writer configuration the reference's
Kafka paths imply (R8/R12: Avro-serialized key+value via Schema Registry,
earliest reset, subscribe by list or '^'-regex) on Spark's Kafka source/
sink. The spark-sql-kafka-0-10 jar is NOT in this image, so everything
here is import-safe and fails with a clear message only when actually
started; option-building is pure and unit-tested.

At scale: the Kafka source maps one Spark task per topic-partition (the
consumer-group parallelism of the reference, but elastic), and
``minPartitions`` can oversplit hot partitions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyconnect_spark.config import SinkConfig, SourceConfig
from pyconnect_spark.functions.avro import (
    SchemaRegistryClient,
    unwrap_confluent,
    wrap_confluent,
)


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def sink_reader_options(config: SinkConfig) -> dict[str, str]:
    """Options for readStream.format('kafka') matching the reference's
    consumer construction (pyconnectsink.py:91-113): earliest reset,
    subscribe list or '^'-prefixed regex pattern, group id."""
    opts = {
        "kafka.bootstrap.servers": ",".join(config.bootstrap_servers),
        "startingOffsets": "earliest",
        "kafka.group.id": config.group_id,
        "failOnDataLoss": "true",
    }
    regex = [t for t in config.topics if t.startswith("^")]
    plain = [t for t in config.topics if not t.startswith("^")]
    if regex and plain:
        raise ValueError("cannot mix plain topics and regex subscriptions")
    if regex:
        opts["subscribePattern"] = regex[0]
    else:
        opts["subscribe"] = ",".join(plain)
    for k, v in (config.kafka_opts or {}).items():
        opts[f"kafka.{k}"] = v
    return opts


def source_writer_options(config: SourceConfig) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": ",".join(config.bootstrap_servers),
        "topic": config.topic,
    }
    for k, v in (config.kafka_opts or {}).items():
        opts[f"kafka.{k}"] = v
    return opts


def _require_avro(spark: SparkSession) -> None:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.SchemaConverters"
        )
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "spark-avro jar not on classpath; add org.apache.spark:spark-avro "
            "to spark.jars.packages to decode Confluent Avro"
        ) from e


def decode_confluent_avro(
    spark: SparkSession, col: Column, avro_schema_json: str
) -> Column:
    """Confluent-framed Kafka value → struct column: strip the 5-byte
    header (magic + schema id), then from_avro with the registry schema.
    (from_avro expects raw Avro — the framing is the part Spark lacks.)"""
    _require_avro(spark)
    from pyspark.sql.avro.functions import from_avro

    return from_avro(unwrap_confluent(col), avro_schema_json)


def encode_confluent_avro(
    spark: SparkSession, col: Column, avro_schema_json: str, schema_id: int
) -> Column:
    _require_avro(spark)
    from pyspark.sql.avro.functions import to_avro

    return wrap_confluent(to_avro(col, avro_schema_json), schema_id)


def registry_schema_for_topic(
    registry_url: str, topic: str, part: str = "value"
) -> tuple[int, dict]:
    """Fetch the latest schema for <topic>-key/<topic>-value (the subject
    convention the reference's serializers use)."""
    client = SchemaRegistryClient(registry_url)
    return client.get_latest(f"{topic}-{part}")


def kafka_record_stream(
    spark: SparkSession, config: SinkConfig, value_schema_json: Optional[str] = None
) -> DataFrame:
    """readStream from Kafka with the reference's record shape: key/value
    (Avro-decoded when a schema is given), topic, partition, offset."""
    reader = spark.readStream.format("kafka")
    for k, v in sink_reader_options(config).items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_schema_json is not None:
        df = df.withColumn(
            "value", decode_confluent_avro(spark, F.col("value"), value_schema_json)
        )
    return df


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka-0-10 jar not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        )


class KafkaSource:
    """File/records → Kafka topic producer connector (reference
    PyConnectSource parity on a real broker: pyconnectsource.py:152-196).

    Wraps a :class:`~pyconnect_spark.streaming.source.SparkSource`-shaped
    record stream and publishes (key, value) to ``config.topic`` via the
    Spark Kafka sink. Offset persistence = the streaming checkpoint (the
    reference's offset-topic replay collapses into checkpointed source
    offsets, SURVEY §2.1 R10/R11): a second run with the same checkpoint
    publishes only unseen records.
    """

    def __init__(self, spark, config: SourceConfig, records_df: DataFrame, *, checkpoint: str):
        _require_kafka(spark)
        self.spark = spark
        self.config = config
        self.records_df = records_df
        self.checkpoint = checkpoint

    def run(self) -> None:
        writer = (
            self.records_df.selectExpr(
                "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
            )
            .writeStream.format("kafka")
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
        )
        for k, v in source_writer_options(self.config).items():
            writer = writer.option(k, v)
        q = writer.start()
        q.awaitTermination()


def kafka_sink_stream(spark: SparkSession, config: SinkConfig) -> DataFrame:
    """The SparkSink.read_stream body for a Kafka transport: records as
    (key string, value string, topic, partition, offset) — the
    confluent_kafka.Message shape (reference core.py:15-25)."""
    _require_kafka(spark)
    df = kafka_record_stream(spark, config)
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
    )
