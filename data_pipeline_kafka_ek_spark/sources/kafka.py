"""Kafka source adapter (S1/S3/S7/S8) — the reference's primary ingress.

No Kafka broker (or spark-sql-kafka connector jar) exists in this test
container, so these builders assemble the exact reader/writer and payload
wiring that runs against a real cluster; tests cover the payload
transforms (`decode_value` / `encode_value`) on batch DataFrames, which is
where all the logic lives. The stream/table duality (S2/S3: one topic read
as both changelog-table and append-stream, reference:
ksqldb-statements.sql:42-45) is `latest_per_key` applied or not applied to
the same decoded stream.

Cluster-path integration harness: ``tests/test_kafka_integration.py`` —
jar-gated via ``SPARK_GRAFT_JARS`` (spark-avro for the fmt="avro" decode;
spark-sql-kafka + SPARK_GRAFT_KAFKA_BOOTSTRAP for the broker round-trip);
skips with the exact jar list when the artifacts are absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """``CREATE STREAM ... WITH (KAFKA_TOPIC=...)`` twin (S1, reference:
    README.md:99). ``starting_offsets`` is the reference's
    ``SET 'auto.offset.reset'`` (S8, ksqldb-statements.sql:49). Requires the
    spark-sql-kafka package on the classpath (not present in this
    container)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def decode_value(df: DataFrame, schema: str, fmt: str = "json") -> DataFrame:
    """Decode the Kafka message envelope into typed columns.

    The reference's Avro path delegates schema lookup to Schema Registry
    (README.md:95-96); Spark's `from_avro` needs the writer schema passed
    explicitly and the 5-byte Confluent wire header stripped
    (SURVEY.md §7.3) — that variant is `fmt="avro"`. JSON needs neither.
    Keeps Kafka metadata (key, topic, partition, offset, timestamp).
    """
    meta = [
        F.col("key").cast("string").alias("kafka_key"),
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_ts"),
    ]
    meta_names = ["kafka_key", "kafka_topic", "kafka_partition", "kafka_offset", "kafka_ts"]
    if fmt == "json":
        parsed = df.select(
            *meta, F.from_json(F.col("value").cast("string"), schema).alias("v")
        )
        return parsed.select(*meta_names, "v.*")
    if fmt == "avro":
        from data_pipeline_kafka_ek_spark.sources.avro_wire import (
            strip_confluent_header,
        )

        try:
            from pyspark.sql.avro.functions import from_avro

            # the python shim imports fine without the spark-avro jar and
            # only fails at analysis time — probe eagerly so callers get a
            # clear capability error at build time, not mid-stream
            probe = df.sparkSession.range(1).select(
                from_avro(F.lit(b"\x00"), '{"type": "record", "name": "p", "fields": []}')
            )
            probe.schema  # forces analysis
        except Exception as exc:
            raise NotImplementedError(
                "spark-avro package not on the classpath; use "
                "sources.avro_wire.decode_confluent_avro_local as the "
                "jar-less twin"
            ) from exc
        # strip the Confluent wire format header: magic byte + 4-byte schema id
        payload = strip_confluent_header(F.col("value"))
        parsed = df.select(*meta, from_avro(payload, schema).alias("v"))
        return parsed.select(*meta_names, "v.*")
    raise ValueError(f"unsupported format {fmt!r}")


def encode_value(df: DataFrame, key_col: str) -> DataFrame:
    """Build the (key, value) envelope for the Kafka sink (K3): key = the
    re-key column (T6), value = JSON of the whole row."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
