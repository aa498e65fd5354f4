"""Confluent Schema Registry client (S1 ingress, reference:
README.md:95-96, docker-compose.yml:95-98).

The wire format needs exactly one registry lookup — ``GET
/schemas/ids/{id}`` -> writer schema — so that is the whole client:
stdlib urllib, a permanent in-process cache (registered schema ids are
immutable in the registry, so entries never invalidate), and a parser
from the registry's Avro record-schema JSON to the ``[(name, type), ...]``
field list the jar-less local codec (``avro_wire``) consumes.

The client lives DRIVER-side: a schema is fetched once per (client, id)
and enters executor plans as a plain Python structure via
``decode_confluent_avro_local(fields=...)`` — never as a per-row lookup.
"""

from __future__ import annotations

import json
from urllib import request

from data_pipeline_kafka_ek_spark.sources.avro_wire import _PRIMITIVES


class SchemaRegistryClient:
    """Minimal cached registry client for the Confluent wire format."""

    def __init__(self, base_url: str, timeout_s: float = 10.0) -> None:
        self._base = base_url.rstrip("/")
        self._timeout = timeout_s
        self._cache: dict[int, str] = {}

    def get_schema(self, schema_id: int) -> str:
        """Writer-schema JSON document for ``schema_id`` (cached forever —
        ids are immutable)."""
        if schema_id not in self._cache:
            req = request.Request(
                f"{self._base}/schemas/ids/{schema_id}",
                headers={"Accept": "application/vnd.schemaregistry.v1+json"},
            )
            with request.urlopen(req, timeout=self._timeout) as resp:
                self._cache[schema_id] = json.loads(resp.read())["schema"]
        return self._cache[schema_id]

    def get_fields(self, schema_id: int) -> list[tuple[str, object]]:
        """Writer schema as the field list ``decode_confluent_avro_local``
        and ``encode_record``/``decode_record`` consume."""
        return fields_from_avro_schema(self.get_schema(schema_id))


def fields_from_avro_schema(schema_json: str) -> list[tuple[str, object]]:
    """Flatten an Avro RECORD schema document to ``[(name, type), ...]``
    for the local codec: primitive type names pass through, nullable
    unions stay lists. Nested records/arrays/maps are outside the
    reference's ratings shape and the local codec's subset — reject them
    loudly rather than mis-decode."""
    doc = json.loads(schema_json)
    if doc.get("type") != "record":
        raise ValueError(f"not a record schema: {doc.get('type')!r}")
    fields: list[tuple[str, object]] = []
    for f in doc["fields"]:
        t = f["type"]
        supported = (isinstance(t, str) and t in _PRIMITIVES) or (
            isinstance(t, list)
            and all(
                isinstance(x, str) and (x == "null" or x in _PRIMITIVES)
                for x in t
            )
        )
        if not supported:
            raise ValueError(
                f"unsupported field type for the local codec: "
                f"{f.get('name')}: {t!r}"
            )
        fields.append((f["name"], t))
    return fields
