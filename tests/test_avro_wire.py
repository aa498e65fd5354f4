"""Confluent Avro wire-format path (the reference's declared default
ingress encoding, README.md:95-96): pure-Python codec round-trip, JVM
framing expressions, the jar-less mapInPandas decode twin, and the
capability gate on the real from_avro path."""

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.sources import avro_wire, kafka

# the reference's ratings value schema shape (ksqldb datagen ratings)
RATINGS_FIELDS = [
    ("rating_id", "long"),
    ("user_id", "int"),
    ("stars", "int"),
    ("route_id", "int"),
    ("rating_time", "long"),
    ("channel", "string"),
    ("message", ["null", "string"]),
]
RATINGS_DDL = (
    "rating_id bigint, user_id int, stars int, route_id int, "
    "rating_time bigint, channel string, message string"
)

ROWS = [
    {"rating_id": 1, "user_id": 9, "stars": 1, "route_id": 7693,
     "rating_time": 1612345678901, "channel": "web", "message": "worst. flight. ever. #neveragain"},
    {"rating_id": 2, "user_id": -3, "stars": 4, "route_id": 0,
     "rating_time": 0, "channel": "ios", "message": None},
    {"rating_id": 2**40, "user_id": 2**31 - 1, "stars": -(2**31), "route_id": 1,
     "rating_time": -(2**40), "channel": "", "message": "ok"},
]


def test_codec_roundtrip_including_negatives_and_nulls():
    for row in ROWS:
        body = avro_wire.encode_record(RATINGS_FIELDS, row)
        assert avro_wire.decode_record(RATINGS_FIELDS, body) == row


def test_codec_matches_avro_spec_examples():
    # avro spec binary-encoding examples: zigzag varints
    out = bytearray()
    avro_wire._write_varint(out, 0)
    assert bytes(out) == b"\x00"
    out = bytearray()
    avro_wire._write_varint(out, -1)
    assert bytes(out) == b"\x01"
    out = bytearray()
    avro_wire._write_varint(out, 1)
    assert bytes(out) == b"\x02"
    out = bytearray()
    avro_wire._write_varint(out, -64)
    assert bytes(out) == b"\x7f"
    out = bytearray()
    avro_wire._write_varint(out, 64)
    assert bytes(out) == b"\x80\x01"
    # spec example: string "foo" -> length 3 then utf8
    body = avro_wire.encode_record([("s", "string")], {"s": "foo"})
    assert body == b"\x06foo"


def _framed_df(spark, schema_id=42):
    payloads = [
        (i, avro_wire.confluent_frame(
            schema_id, avro_wire.encode_record(RATINGS_FIELDS, row)))
        for i, row in enumerate(ROWS)
    ]
    return spark.createDataFrame(payloads, "kafka_offset int, value binary")


def test_jvm_framing_expressions(spark):
    df = _framed_df(spark, schema_id=123456)
    got = df.select(
        avro_wire.confluent_schema_id("value").alias("sid"),
        avro_wire.is_confluent_framed("value").alias("ok"),
        F.length(avro_wire.strip_confluent_header("value")).alias("body_len"),
        F.length("value").alias("full_len"),
    ).collect()
    assert all(r.sid == 123456 and r.ok for r in got)
    assert all(r.body_len == r.full_len - 5 for r in got)


def test_jvm_schema_id_negative_int32(spark):
    # big-endian int32 is signed; ids >= 2^31 in the 4 raw bytes must fold
    df = spark.createDataFrame(
        [(bytes([0, 0xFF, 0xFF, 0xFF, 0xFE]) + b"\x00",)], "value binary"
    )
    assert df.select(
        avro_wire.confluent_schema_id("value").alias("sid")
    ).first().sid == -2


def test_local_decode_roundtrip_and_dlq(spark):
    good_df = _framed_df(spark, schema_id=42)
    junk = spark.createDataFrame(
        [(100, None), (101, b"\x01garbage-no-magic"), (102, b"\x00\x00")],
        "kafka_offset int, value binary",
    )
    df = good_df.union(junk)
    good, dlq = avro_wire.decode_confluent_avro_local(
        df, RATINGS_FIELDS, RATINGS_DDL, expected_schema_id=42
    )
    rows = {r.rating_id: r for r in good.collect()}
    assert set(rows) == {1, 2, 2**40}
    assert rows[1].message.startswith("worst. flight")
    assert rows[2].message is None
    assert rows[2**40].rating_time == -(2**40)
    assert rows[1].kafka_offset == 0  # passthrough metadata survives
    assert sorted(r.kafka_offset for r in dlq.collect()) == [100, 101, 102]


def test_local_decode_wrong_schema_id_dead_letters(spark):
    df = _framed_df(spark, schema_id=7)
    good, dlq = avro_wire.decode_confluent_avro_local(
        df, RATINGS_FIELDS, RATINGS_DDL, expected_schema_id=42
    )
    assert good.count() == 0
    assert dlq.count() == len(ROWS)


def test_from_avro_path_capability_gated(spark):
    # container has no spark-avro jar: the real path must fail fast at
    # build time with NotImplementedError, not mid-stream at analysis
    df = _framed_df(spark).withColumnRenamed("kafka_offset", "offset")
    df = df.select(
        F.lit(b"k").alias("key"), F.lit("t").alias("topic"),
        F.lit(0).alias("partition"), "offset",
        F.current_timestamp().alias("timestamp"), "value",
    )
    with pytest.raises(NotImplementedError, match="spark-avro"):
        kafka.decode_value(df, '{"type":"record"}', fmt="avro")


# ---------------------------------------------------------------------------
# schema-registry client (S1 ingress completion: schema-id -> writer schema)
# ---------------------------------------------------------------------------

RATINGS_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "ratings",
        "fields": [
            {"name": n, "type": t} for n, t in RATINGS_FIELDS
        ],
    }
)


def _registry_server(schemas: dict[int, str]):
    """Stdlib HTTP stub answering GET /schemas/ids/{id}; returns
    (server, base_url, request_log)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    log = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            log.append(self.path)
            sid = int(self.path.rsplit("/", 1)[-1])
            if sid in schemas:
                body = json.dumps({"schema": schemas[sid]}).encode()
                self.send_response(200)
            else:
                body = b'{"error_code": 40403, "message": "Schema not found"}'
                self.send_response(404)
            self.send_header("Content-Type",
                             "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}", log


def test_registry_client_fetch_parse_and_cache():
    from data_pipeline_kafka_ek_spark.sources.registry import (
        SchemaRegistryClient,
    )

    srv, url, log = _registry_server({42: RATINGS_AVRO_SCHEMA})
    try:
        client = SchemaRegistryClient(url)
        fields = client.get_fields(42)
        assert fields == RATINGS_FIELDS
        # immutable ids cache forever: the second lookup never hits HTTP
        assert client.get_fields(42) == RATINGS_FIELDS
        assert log == ["/schemas/ids/42"]
        with pytest.raises(Exception):  # unknown id surfaces the 404
            client.get_schema(99)
    finally:
        srv.shutdown()
        srv.server_close()


def test_registry_fed_spark_decode_roundtrip(spark):
    """The completed S1 ingress story without jars: encode with a
    REGISTERED schema, decode via the client-fetched writer schema."""
    from data_pipeline_kafka_ek_spark.sources.registry import (
        SchemaRegistryClient,
    )

    srv, url, _ = _registry_server({42: RATINGS_AVRO_SCHEMA})
    try:
        client = SchemaRegistryClient(url)
        df = _framed_df(spark, schema_id=42)
        sid = df.select(
            avro_wire.confluent_schema_id("value").alias("sid")
        ).first().sid
        good, dlq = avro_wire.decode_confluent_avro_local(
            df, client.get_fields(sid), RATINGS_DDL, expected_schema_id=sid
        )
        rows = {r.rating_id: r for r in good.collect()}
        assert set(rows) == {1, 2, 2**40}
        assert rows[1].channel == "web" and rows[2].message is None
        assert dlq.count() == 0
    finally:
        srv.shutdown()
        srv.server_close()


def test_registry_parser_rejects_nested_types():
    from data_pipeline_kafka_ek_spark.sources.registry import (
        fields_from_avro_schema,
    )

    nested = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": {"type": "array", "items": "int"}}
            ],
        }
    )
    with pytest.raises(ValueError, match="unsupported"):
        fields_from_avro_schema(nested)
    with pytest.raises(ValueError, match="not a record"):
        fields_from_avro_schema('{"type": "enum", "name": "e", "symbols": []}')
