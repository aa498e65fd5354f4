"""Minimal MongoDB wire format: BSON documents + OP_MSG framing.

The reference ships derived streams to MongoDB through the Kafka Connect
Mongo sink (reference: README.md:358-370) — upsert-by-id document
writes. The local twin (`sinks.mongo_sink`) tests those semantics with
an injected callable; this module takes the last step to the WIRE level
with zero dependencies, mirroring what `sources/avro_wire.py` does for
the Confluent-Avro ingress and `sinks.es_http_transport` does for the
Elasticsearch egress:

* ``bson_encode_doc`` / ``bson_decode_doc`` — the BSON subset the sink's
  documents need (double, string, embedded doc, array, bool, UTC
  datetime, null, int64; int32 on decode — a real mongod encodes
  reply counters that way), per the public BSON spec (bsonspec.org).
* ``op_msg`` / ``parse_op_msg`` — OP_MSG (opcode 2013) framing with one
  kind-0 body section, the only message modern MongoDB speaks.
* ``upsert_command`` — the ``update`` command with ``upsert: true`` per
  document, which IS the connector's replace-by-``_id`` delivery.
* ``MongoWireTransport`` — a picklable per-partition transport for
  ``mongo_sink``: open socket, one command per partition batch, check
  ``ok`` in the reply. At-least-once delivery stays idempotent because
  every write is an upsert keyed by ``_id``.

Executor-side scale note: like the ES transport, one connection and one
round-trip per (micro-batch, partition) — no driver funnel, no per-row
round-trips.
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct

# BSON element type tags (bsonspec.org)
_T_DOUBLE = 0x01
_T_STRING = 0x02
_T_DOC = 0x03
_T_ARRAY = 0x04
_T_BOOL = 0x08
_T_DATETIME = 0x09
_T_NULL = 0x0A
_T_INT32 = 0x10
_T_INT64 = 0x12

_OP_MSG = 2013
_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _encode_value(out: bytearray, name: str, v) -> None:
    key = name.encode() + b"\x00"
    if v is None:
        out.append(_T_NULL)
        out += key
    elif isinstance(v, bool):  # before int: bool is an int subclass
        out.append(_T_BOOL)
        out += key
        out.append(1 if v else 0)
    elif isinstance(v, int):
        out.append(_T_INT64)
        out += key
        out += struct.pack("<q", v)
    elif isinstance(v, float):
        out.append(_T_DOUBLE)
        out += key
        out += struct.pack("<d", v)
    elif isinstance(v, str):
        out.append(_T_STRING)
        out += key
        b = v.encode()
        out += struct.pack("<i", len(b) + 1) + b + b"\x00"
    elif isinstance(v, _dt.datetime):
        out.append(_T_DATETIME)
        out += key
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        out += struct.pack("<q", int((v - _EPOCH).total_seconds() * 1000))
    elif isinstance(v, dict):
        out.append(_T_DOC)
        out += key
        out += bson_encode_doc(v)
    elif isinstance(v, (list, tuple)):
        out.append(_T_ARRAY)
        out += key
        out += bson_encode_doc({str(i): x for i, x in enumerate(v)})
    else:
        raise TypeError(f"unsupported BSON value type: {type(v).__name__}")


def bson_encode_doc(doc: dict) -> bytes:
    body = bytearray()
    for k, v in doc.items():
        _encode_value(body, k, v)
    return struct.pack("<i", len(body) + 5) + bytes(body) + b"\x00"


def _decode_value(buf: bytes, pos: int, tag: int):
    if tag == _T_NULL:
        return None, pos
    if tag == _T_BOOL:
        return buf[pos] == 1, pos + 1
    if tag == _T_INT32:
        # a real mongod encodes small counters (ok-adjacent n/nModified)
        # as int32 — decode both widths even though we always emit int64
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if tag == _T_INT64:
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if tag == _T_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if tag == _T_STRING:
        n = struct.unpack_from("<i", buf, pos)[0]
        s = buf[pos + 4 : pos + 4 + n - 1].decode()
        return s, pos + 4 + n
    if tag == _T_DATETIME:
        ms = struct.unpack_from("<q", buf, pos)[0]
        return _EPOCH + _dt.timedelta(milliseconds=ms), pos + 8
    if tag in (_T_DOC, _T_ARRAY):
        n = struct.unpack_from("<i", buf, pos)[0]
        inner = bson_decode_doc(buf[pos : pos + n])
        if tag == _T_ARRAY:
            return [inner[str(i)] for i in range(len(inner))], pos + n
        return inner, pos + n
    raise ValueError(f"unsupported BSON tag 0x{tag:02x}")


def bson_decode_doc(buf: bytes) -> dict:
    n = struct.unpack_from("<i", buf, 0)[0]
    if n != len(buf) or buf[-1] != 0:
        raise ValueError("malformed BSON document")
    out: dict = {}
    pos = 4
    while buf[pos] != 0:
        tag = buf[pos]
        pos += 1
        end = buf.index(b"\x00", pos)
        name = buf[pos:end].decode()
        pos = end + 1
        out[name], pos = _decode_value(buf, pos, tag)
    return out


def op_msg(command: dict, request_id: int, response_to: int = 0) -> bytes:
    """Frame a command document as an OP_MSG with one kind-0 section."""
    body = struct.pack("<I", 0) + b"\x00" + bson_encode_doc(command)
    header = struct.pack(
        "<iiii", 16 + len(body), request_id, response_to, _OP_MSG
    )
    return header + body


def parse_op_msg(buf: bytes) -> tuple[int, int, dict]:
    """Parse an OP_MSG frame -> (request_id, response_to, command doc)."""
    length, request_id, response_to, opcode = struct.unpack_from("<iiii", buf, 0)
    if length != len(buf) or opcode != _OP_MSG:
        raise ValueError(f"not a complete OP_MSG frame (op={opcode})")
    # flagBits uint32, then section kind byte (only kind 0 supported here)
    if buf[20] != 0:
        raise ValueError("only kind-0 OP_MSG sections are supported")
    return request_id, response_to, bson_decode_doc(buf[21:])


def upsert_command(db: str, collection: str, docs: list[dict]) -> dict:
    """The connector's delivery as a wire command: REPLACE-by-``_id`` with
    ``upsert: true`` for every document. The update document has no
    ``$``-operators, which per the update command's contract makes it a
    full replacement — a field dropped upstream disappears from the
    stored document too (a ``$set`` merge would resurrect it), and
    retried or out-of-order redeliveries converge to the same state."""
    return {
        "update": collection,
        "$db": db,
        "updates": [
            {
                "q": {"_id": d["_id"]},
                "u": {k: v for k, v in d.items() if k != "_id"},
                "upsert": True,
                "multi": False,
            }
            for d in docs
        ],
    }


def _recv_frame(sock: socket.socket) -> bytes:
    head = b""
    while len(head) < 4:
        chunk = sock.recv(4 - len(head))
        if not chunk:
            raise ConnectionError("socket closed mid-frame")
        head += chunk
    (length,) = struct.unpack("<i", head)
    buf = head
    while len(buf) < length:
        chunk = sock.recv(length - len(buf))
        if not chunk:
            raise ConnectionError("socket closed mid-frame")
        buf += chunk
    return buf


class MongoWireTransport:
    """Picklable ``transport(collection, docs)`` for ``mongo_sink``: one
    socket connection and one upsert command per partition batch, reply
    checked for ``ok: 1`` (a failed shipment raises, and the shipper's
    tolerant path dead-letters the batch — behavior.on.error semantics)."""

    def __init__(self, host: str, port: int, db: str = "pipeline", timeout_s: float = 10.0):
        self.host, self.port, self.db, self.timeout_s = host, port, db, timeout_s

    def __call__(self, collection: str, docs: list[dict]) -> None:
        cmd = upsert_command(self.db, collection, docs)
        with socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        ) as sock:
            sock.sendall(op_msg(cmd, request_id=1))
            _, _, reply = parse_op_msg(_recv_frame(sock))
        if reply.get("ok") != 1.0:
            raise RuntimeError(f"mongo write failed: {reply}")
        if reply.get("writeErrors"):
            raise RuntimeError(f"mongo write errors: {reply['writeErrors']}")
