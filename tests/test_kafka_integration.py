"""Jar-gated Kafka/Avro integration harness (S1/K3 cluster path).

This container ships neither the Spark Kafka/Avro connector jars nor a
broker, so `sources/kafka.py` is normally exercised through its jar-less
local twins. This module closes the loop when the real artifacts ARE
available. Run it in its OWN pytest process (Spark jars attach at JVM
launch, so a jar-less SparkContext from other modules can't be upgraded
in place):

    SPARK_GRAFT_JARS=<comma-separated jar paths> \
        python -m pytest tests/test_kafka_integration.py

Required jars (Spark 4.x / Scala 2.13 builds):
  * spark-avro_2.13                      — the ``fmt="avro"`` decode path
  * spark-sql-kafka-0-10_2.13, kafka-clients,
    spark-token-provider-kafka-0-10_2.13, commons-pool2
                                         — the broker round-trip
Optional:
  * SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port — a reachable broker; only the
    kafka_stream round-trip needs it (the Avro test is broker-free).
"""

from __future__ import annotations

import datetime
import json
import os
import uuid

import pytest

JARS = os.environ.get("SPARK_GRAFT_JARS")
BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not JARS,
    reason=(
        "SPARK_GRAFT_JARS unset — set it to comma-separated jar paths: "
        "spark-avro_2.13 (avro decode), plus spark-sql-kafka-0-10_2.13 + "
        "kafka-clients + spark-token-provider-kafka-0-10_2.13 + "
        "commons-pool2 (broker round-trip, also needs "
        "SPARK_GRAFT_KAFKA_BOOTSTRAP)"
    ),
)

# the reference's ratings schema (docker-compose.yml datagen; SURVEY.md §2.1)
RATING_FIELDS: list[tuple[str, object]] = [
    ("rating_id", "long"),
    ("user_id", ["null", "long"]),
    ("stars", "int"),
    ("route_id", "int"),
    ("rating_time", "long"),
    ("channel", "string"),
    ("message", ["null", "string"]),
]
RATING_DDL = (
    "rating_id long, user_id long, stars int, route_id int, "
    "rating_time long, channel string, message string"
)
RATING_AVRO_JSON = json.dumps(
    {
        "type": "record",
        "name": "rating",
        "fields": [{"name": n, "type": t} for n, t in RATING_FIELDS],
    }
)
RATING_ROWS = [
    {"rating_id": 1, "user_id": 8, "stars": 4, "route_id": 2350,
     "rating_time": 1111, "channel": "web", "message": "great trip"},
    {"rating_id": 2, "user_id": None, "stars": 1, "route_id": 12,
     "rating_time": 2222, "channel": "ios", "message": None},
    {"rating_id": 3, "user_id": 15, "stars": 5, "route_id": 99,
     "rating_time": 3333, "channel": "android", "message": "more peanuts"},
]


@pytest.fixture(scope="module")
def jar_spark():
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    if SparkContext._active_spark_context is not None:
        pytest.skip(
            "a jar-less SparkContext is already running in this process; "
            "run this module alone: SPARK_GRAFT_JARS=... python -m pytest "
            "tests/test_kafka_integration.py"
        )
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-avro-integration")
        .config("spark.jars", JARS)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def _confluent_envelope_df(spark, schema_id: int = 7):
    """Kafka-envelope-shaped batch of Confluent-framed Avro values, built
    with the pure-Python codec (the same bytes a registry-aware producer
    emits)."""
    from data_pipeline_kafka_ek_spark.sources import avro_wire

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            str(r["rating_id"]).encode(),
            avro_wire.confluent_frame(
                schema_id, avro_wire.encode_record(RATING_FIELDS, r)
            ),
            "ratings",
            0,
            i,
            t0,
        )
        for i, r in enumerate(RATING_ROWS)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )


def test_avro_cluster_path_matches_local_twin(jar_spark):
    """decode_value(fmt='avro') — header strip + real from_avro — must
    produce exactly what the jar-less mapInPandas twin produces."""
    from data_pipeline_kafka_ek_spark.sources import avro_wire, kafka

    env = _confluent_envelope_df(jar_spark)
    cluster = kafka.decode_value(env, RATING_AVRO_JSON, fmt="avro")
    data_cols = [n for n, _ in RATING_FIELDS]

    local_good, local_dlq = avro_wire.decode_confluent_avro_local(
        env, RATING_FIELDS, RATING_DDL
    )
    assert local_dlq.count() == 0

    got_cluster = sorted(map(tuple, cluster.select(*data_cols).collect()))
    got_local = sorted(map(tuple, local_good.select(*data_cols).collect()))
    assert got_cluster == got_local
    assert len(got_cluster) == len(RATING_ROWS)
    # nullable-union branches decoded, not defaulted
    by_id = {t[0]: t for t in got_cluster}
    assert by_id[2][1] is None and by_id[2][6] is None
    # Kafka metadata survives the decode
    assert set(
        ("kafka_key", "kafka_topic", "kafka_partition", "kafka_offset", "kafka_ts")
    ) <= set(cluster.columns)


def test_kafka_stream_roundtrip_through_broker(jar_spark, tmp_path):
    """encode_value -> kafka_topic_sink(real broker) -> kafka_stream ->
    decode_value(fmt='json'): the full S1/K3 data plane against a live
    cluster, reading from earliest like the reference's
    SET 'auto.offset.reset'='earliest'."""
    if not BOOTSTRAP:
        pytest.skip("SPARK_GRAFT_KAFKA_BOOTSTRAP unset — no broker to test against")
    from pyspark.sql import functions as F

    from data_pipeline_kafka_ek_spark.sources import kafka
    from data_pipeline_kafka_ek_spark.streaming import sinks

    topic = f"graft_it_{uuid.uuid4().hex[:8]}"
    df = jar_spark.createDataFrame(
        [(r["rating_id"], r["stars"], r["channel"]) for r in RATING_ROWS],
        "rating_id long, stars int, channel string",
    )
    sinks.kafka_topic_sink(topic, "rating_id", str(tmp_path), BOOTSTRAP)(df, 0)

    stream = kafka.kafka_stream(jar_spark, topic, BOOTSTRAP, "earliest")
    decoded = kafka.decode_value(
        stream.withColumn("value", F.col("value").cast("string")),
        "rating_id long, stars int, channel string",
        fmt="json",
    )
    name = f"q_{topic}"
    q = (
        decoded.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, jar_spark.table(name).select("rating_id", "stars", "channel").collect())
    )
    assert got == sorted(
        (r["rating_id"], r["stars"], r["channel"]) for r in RATING_ROWS
    )
    # message key carries the re-key column (T6 semantics)
    keys = {r.kafka_key for r in jar_spark.table(name).collect()}
    assert keys == {str(r["rating_id"]) for r in RATING_ROWS}
