"""Confluent Avro wire format (S1 ingress encoding — the reference's
declared default, reference: README.md:95-96, docker-compose.yml:95-98).

A Confluent-framed Kafka message value is::

    byte 0      magic byte, always 0x00
    bytes 1-4   schema-registry schema id, big-endian int32
    bytes 5..   Avro binary body (writer schema = registry[schema id])

Two tiers, same seam:

* **Cluster path** — ``strip_confluent_header`` / ``confluent_schema_id``
  are pure JVM column expressions; ``kafka.decode_value(fmt="avro")``
  feeds the stripped body to Spark's ``from_avro`` (requires the
  spark-avro package, absent in this container — capability-gated).
* **Local twin** — ``decode_confluent_avro_local`` decodes the body with
  an Arrow-batched ``mapInPandas`` implementation of the Avro 1.x binary
  spec subset the reference's ratings schema needs (zigzag-varint
  int/long, IEEE float/double, length-prefixed string/bytes, boolean,
  nullable unions). The spec is public (avro.apache.org); this twin
  exists so the wire path is testable without the jar and is NOT meant
  to outrun ``from_avro`` on a cluster.

The pure-Python codec lives here too (``encode_record`` /
``decode_record``): tests use the encoder to synthesize Confluent-framed
payloads, and round-trip them through the Spark-side decoder.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONFLUENT_MAGIC = 0x00
_HEADER_LEN = 5

# schema field type -> (encoder, decoder) dispatch keys
_PRIMITIVES = {"int", "long", "string", "bytes", "double", "float", "boolean"}


# ---------------------------------------------------------------------------
# Avro binary codec (spec subset; avro.apache.org/docs - binary encoding)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n) & ((1 << 64) - 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc), pos
        shift += 7


def _encode_value(out: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # nullable union, e.g. ["null", "string"]
        if v is None:
            _write_varint(out, typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        _write_varint(out, branch)
        _encode_value(out, typ[branch], v)
    elif typ in ("int", "long"):
        _write_varint(out, int(v))
    elif typ == "string":
        b = v.encode("utf-8")
        _write_varint(out, len(b))
        out.extend(b)
    elif typ == "bytes":
        _write_varint(out, len(v))
        out.extend(v)
    elif typ == "double":
        out.extend(_struct.pack("<d", v))
    elif typ == "float":
        out.extend(_struct.pack("<f", v))
    elif typ == "boolean":
        out.append(1 if v else 0)
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(typ, buf: bytes, pos: int):
    if isinstance(typ, list):
        branch, pos = _read_varint(buf, pos)
        if typ[branch] == "null":
            return None, pos
        return _decode_value(typ[branch], buf, pos)
    if typ in ("int", "long"):
        return _read_varint(buf, pos)
    if typ == "string":
        n, pos = _read_varint(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _read_varint(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if typ == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported avro type {typ!r}")


def encode_record(fields: list[tuple[str, object]], row: dict) -> bytes:
    """Avro-binary-encode ``row`` against ``fields`` ([(name, type), ...],
    record fields in writer order)."""
    out = bytearray()
    for name, typ in fields:
        _encode_value(out, typ, row[name])
    return bytes(out)


def decode_record(fields: list[tuple[str, object]], payload: bytes) -> dict:
    """Inverse of :func:`encode_record`."""
    row, pos = {}, 0
    for name, typ in fields:
        row[name], pos = _decode_value(typ, payload, pos)
    return row


def confluent_frame(schema_id: int, avro_body: bytes) -> bytes:
    """Wrap an Avro binary body in the Confluent wire envelope (test-side
    synthesis of what the registry-aware serializer produces)."""
    return bytes([CONFLUENT_MAGIC]) + _struct.pack(">i", schema_id) + avro_body


# ---------------------------------------------------------------------------
# JVM-side framing expressions (the cluster path's header handling)
# ---------------------------------------------------------------------------


def strip_confluent_header(value: Column | str) -> Column:
    """Drop the 5-byte Confluent header, leaving the raw Avro body for
    ``from_avro`` (SURVEY.md §7.3). Pure JVM expression."""
    c = F.col(value) if isinstance(value, str) else value
    return c.substr(F.lit(_HEADER_LEN + 1), F.length(c) - _HEADER_LEN)


def confluent_schema_id(value: Column | str) -> Column:
    """Extract the big-endian int32 schema id (bytes 1-4) as an int column —
    the dispatch key for a multi-schema topic / registry lookup."""
    c = F.col(value) if isinstance(value, str) else value
    parts = [
        F.conv(F.hex(c.substr(F.lit(i + 2), F.lit(1))), 16, 10).cast("long")
        for i in range(4)
    ]
    acc = parts[0]
    for p in parts[1:]:
        acc = acc * 256 + p
    # big-endian int32 is signed: fold values >= 2^31 back
    return F.when(acc >= 2**31, acc - 2**32).otherwise(acc).cast("int")


def is_confluent_framed(value: Column | str) -> Column:
    """Magic-byte + length sanity check; rows failing it belong in a DLQ,
    not in front of the Avro decoder."""
    c = F.col(value) if isinstance(value, str) else value
    return (
        c.isNotNull()
        & (F.length(c) > _HEADER_LEN)
        & (F.hex(c.substr(F.lit(1), F.lit(1))) == F.lit("00"))
    )


# ---------------------------------------------------------------------------
# Jar-less local twin: Arrow-batched decode of the framed payload
# ---------------------------------------------------------------------------


def decode_confluent_avro_local(
    df: DataFrame,
    fields: list[tuple[str, object]],
    spark_schema: str,
    value_col: str = "value",
    expected_schema_id: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Decode Confluent-framed Avro values without the spark-avro jar.

    Framing checks (magic byte, length, optional schema-id pin) run as JVM
    expressions; only the Avro body decode drops to an Arrow-batched
    ``mapInPandas``. Returns ``(good, dead_letter)`` — unframed or
    wrong-schema rows dead-letter instead of failing the stream (T10
    semantics), mirroring ``parse_json_tolerant``.

    ``fields`` is the writer schema as [(name, avro_type), ...];
    ``spark_schema`` the matching Spark DDL for the decoded columns.
    """
    ok = is_confluent_framed(value_col)
    if expected_schema_id is not None:
        ok = ok & (confluent_schema_id(value_col) == expected_schema_id)
    passthrough = [c for c in df.columns if c != value_col]
    good_in = df.filter(ok).select(
        *passthrough, strip_confluent_header(value_col).alias("__body")
    )
    dlq = df.filter(~ok | ok.isNull())

    out_ddl = ", ".join(
        f"{c} {t}" for c, t in _ddl_pairs(df, passthrough, spark_schema)
    )

    body_cols = [name for name, _ in _ddl_pairs(df, [], spark_schema)]

    def decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            import pandas as pd

            if pdf.empty:
                # pd.DataFrame([]) has zero columns; an empty Arrow batch
                # would otherwise yield a frame missing the body columns
                # and fail mapInPandas schema validation
                continue
            decoded = [decode_record(fields, b) for b in pdf["__body"]]
            body = pd.DataFrame(decoded, columns=body_cols)
            yield pd.concat(
                [pdf[passthrough].reset_index(drop=True), body], axis=1
            )

    good = good_in.mapInPandas(decode, schema=out_ddl)
    return good, dlq


def _ddl_pairs(
    df: DataFrame, passthrough: list[str], spark_schema: str
) -> list[tuple[str, str]]:
    """Passthrough columns + the decoded-body columns as (name, type) pairs.

    The body DDL is parsed with ``StructType.fromDDL`` (not a comma split),
    so parameterized and nested types — ``decimal(10,2)``, ``array<int>``,
    ``map<string,int>`` — produce correct pairs."""
    from pyspark.sql.types import StructType

    pairs = [(c, df.schema[c].dataType.simpleString()) for c in passthrough]
    for f in StructType.fromDDL(spark_schema).fields:
        pairs.append((f.name, f.dataType.simpleString()))
    return pairs
