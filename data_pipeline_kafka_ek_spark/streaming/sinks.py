"""Sink adapters (SURVEY.md §2.2, K1-K7) as ``foreachBatch`` callables.

The reference's sinks are Kafka Connect connectors + two Python consumer
apps; none of their transports (Elasticsearch, MongoDB, Slack, Pushbullet,
Kafka) exist in this container, so each adapter separates *semantics*
(doc-id choice, timestamp injection, tolerance, formatting — all
implemented and tested) from *transport* (an injectable callable; the
default writes JSON-lines/parquet locally so tests can observe exactly
what would have been shipped).

At scale: foreachBatch gives at-least-once delivery; every adapter is
idempotent-by-key (doc id = message key, matching the reference's
``key.ignore=false``, ksqldb-statements.sql:6) so retries overwrite rather
than duplicate.

The document sinks (ES/Mongo) ship from the EXECUTORS via
``foreachPartition`` — the real connectors write from workers
(ksqldb-statements.sql:1-11), and a driver-side collect of the full
ratings stream would OOM the driver at scale. Only the alert sinks
(K5/K6) collect, and only because alert streams are tiny by construction.
Each (batch, partition) writes to a temp file then ``os.replace``s it into
its deterministic name: a task retry under at-least-once delivery replaces
its previous attempt instead of appending duplicates, and concurrent
speculative attempts of the same partition can't interleave into one file —
the last completed attempt wins atomically.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def _partition_id() -> int:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else 0


# process umask, captured once at import (import is single-threaded; the
# transient os.umask() get-and-set would race executor task threads)
_UMASK = os.umask(0)
os.umask(_UMASK)


def _write_jsonl_atomic(path: str, lines: list[str]) -> None:
    """Write-then-rename so concurrent speculative attempts of the same
    (batch, partition) can't interleave into one file; POSIX rename makes
    the last completed attempt win whole. mkstemp creates 0600 files, so
    restore umask-default permissions before publishing — downstream
    consumers may run as another user."""
    import tempfile

    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".tmp.", dir=os.path.dirname(path)
    )
    with os.fdopen(fd, "w") as f:
        for line in lines:
            f.write(line + "\n")
        os.fchmod(f.fileno(), 0o666 & ~_UMASK)
    os.replace(tmp, path)


def _doc_shipper(
    name: str,
    key_col: str,
    out_dir: str,
    tolerant: bool,
    transport: Callable[[str, list[dict]], None] | None,
    batch_id: int,
    null_key_reason: str,
):
    """Build the per-partition writer shared by the ES and Mongo twins.

    Runs on EXECUTORS (closure must stay picklable — ``transport`` too).
    Per partition: rows -> keyed docs (+ dead letters), then one transport
    call / one deterministic ``batch_{id}_p{pid}.jsonl`` file per side.
    """

    def ship(rows) -> None:
        docs: list[dict] = []
        bad: list[dict] = []
        for row in rows:
            d = row.asDict(recursive=True) if isinstance(row, Row) else dict(row)
            # match the connector's JSON view: null-valued fields are absent
            d = {k: v for k, v in d.items() if v is not None}
            try:
                if d.get(key_col) is None:
                    raise ValueError(f"{null_key_reason} ({key_col})")
                d["_id"] = str(d[key_col])
                docs.append(d)
            except Exception as exc:
                if not tolerant:
                    raise
                bad.append({"error": str(exc), "doc": json.dumps(d, default=str)})
        pid = _partition_id()
        if docs:
            if transport is not None:
                try:
                    transport(name, docs)
                except Exception as exc:
                    # connector behavior.on.error: a failed shipment (HTTP
                    # 4xx/5xx, connection refused) dead-letters the whole
                    # partition batch instead of failing the stream
                    if not tolerant:
                        raise
                    bad.extend(
                        {
                            "error": f"transport: {exc}",
                            "doc": json.dumps(d, default=str),
                        }
                        for d in docs
                    )
            else:
                os.makedirs(f"{out_dir}/{name}", exist_ok=True)
                _write_jsonl_atomic(
                    f"{out_dir}/{name}/batch_{batch_id}_p{pid:05d}.jsonl",
                    [json.dumps(d, default=str) for d in docs],
                )
        if bad:
            os.makedirs(f"{out_dir}/{name}__dlq", exist_ok=True)
            _write_jsonl_atomic(
                f"{out_dir}/{name}__dlq/batch_{batch_id}_p{pid:05d}.jsonl",
                [json.dumps(d) for d in bad],
            )

    return ship


def es_http_transport(base_url: str, timeout_s: float = 10.0):
    """Wire-level Elasticsearch transport: POSTs the connector's NDJSON
    bulk format (action line + source line per doc, ``_id`` from the
    sink's key column) to ``{base_url}/_bulk`` over stdlib urllib.

    Picklable by construction (the closure captures only strings and
    numbers), so it ships to executors through ``foreachPartition`` like
    any other transport. Raises on non-2xx — the shipper's tolerant path
    then dead-letters the partition batch (behavior.on.error semantics,
    reference: ksqldb-statements.sql:1-11,70-85).
    """
    bulk_url = base_url.rstrip("/") + "/_bulk"

    def send(index: str, docs: list[dict]) -> None:
        from urllib import request as _request

        lines: list[str] = []
        for d in docs:
            lines.append(
                json.dumps({"index": {"_index": index, "_id": d["_id"]}})
            )
            lines.append(
                json.dumps(
                    {k: v for k, v in d.items() if k != "_id"}, default=str
                )
            )
        req = _request.Request(
            bulk_url,
            data=("\n".join(lines) + "\n").encode(),
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        with _request.urlopen(req, timeout=timeout_s) as resp:
            resp.read()

    return send


def with_extract_ts(df: DataFrame, col_name: str = "extract_ts") -> DataFrame:
    """The connector SMT that stamps ingest wall-clock time (X9, reference:
    ksqldb-statements.sql:8-10,82-84 — ``InsertField$Value`` RATING_TS /
    EXTRACT_TS). ``*_TS`` naming drives the reference's ES date mapping
    (docker-compose.yml:274-279); here the column is a real TimestampType so
    no dynamic-mapping trick is needed."""
    return df.withColumn(col_name, F.current_timestamp())


def elasticsearch_sink(
    index: str,
    key_col: str,
    out_dir: str,
    tolerant: bool = True,
    transport: Callable[[str, list[dict]], None] | None = None,
):
    """ES sink twin (K1/K2): doc id = key column, EXTRACT_TS injected,
    malformed-doc tolerance -> dead-letter file instead of job failure
    (reference: ksqldb-statements.sql:1-11, 70-85).

    Ships executor-side via ``foreachPartition`` — K1 carries the FULL
    ratings stream, so nothing may funnel through the driver.
    ``transport(index, docs)`` is invoked once per non-empty partition (it
    must be picklable); the default writes one JSON-lines file per
    (batch, partition). Docs are keyed and files overwrite on retry, so
    at-least-once delivery stays an idempotent upsert like the real
    connector.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        with_extract_ts(batch_df).foreachPartition(
            _doc_shipper(
                index, key_col, out_dir, tolerant, transport, batch_id,
                null_key_reason="null doc id",
            )
        )

    return sink


def kafka_topic_sink(
    topic: str,
    key_col: str,
    out_dir: str,
    bootstrap_servers: str | None = None,
):
    """Kafka sink twin (K3): every derived stream persists to a named topic
    with an explicit message key (re-key semantics T6). With
    ``bootstrap_servers`` set (real cluster + kafka connector jars) it uses
    the built-in Kafka sink; otherwise the local twin writes
    (key, value-JSON) parquet per topic so tests can assert the payload."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from data_pipeline_kafka_ek_spark.sources.kafka import encode_value

        keyed = encode_value(batch_df, key_col)
        if bootstrap_servers is not None:
            (
                keyed.write.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("topic", topic)
                .save()
            )
        else:
            keyed.write.mode("append").parquet(f"{out_dir}/topic={topic}")

    return sink


def mongo_sink(
    collection: str,
    key_col: str,
    out_dir: str,
    tolerant: bool = True,
    transport: Callable[[str, list[dict]], None] | None = None,
):
    """Mongo sink twin (K4, reference: README.md:358-370): upsert-by-id
    document write, shipped executor-side per partition like the real
    connector; local twin is JSON-lines per collection. Rows with a NULL
    upsert key are dead-lettered when ``tolerant`` — one bad row must not
    kill the streaming query."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.foreachPartition(
            _doc_shipper(
                collection, key_col, out_dir, tolerant, transport, batch_id,
                null_key_reason="null upsert key",
            )
        )

    return sink


def alert_sink(
    notify: Callable[[str], None],
    text_col: str = "alert_text",
    throttle_rows: int | None = None,
    max_rows_per_batch: int = 10_000,
):
    """Slack/Pushbullet alert twin (K5/K6, reference:
    python_kafka_notify.py:41-53): per-row side effect through an injected
    ``notify(message)`` callable. Alert streams are tiny by construction
    (they sit behind highly selective filters), so collecting the batch to
    the driver is the correct shape — same as the reference's
    single-consumer design — and ``max_rows_per_batch`` turns that
    assumption into a GUARANTEE: the collect is limited executor-side, so
    a mis-wired unfiltered stream bounds driver memory instead of OOMing
    it (no human reads 10k alerts per batch anyway). ``throttle_rows``
    caps per-batch sends (T9's deliberate throttling)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cap = max_rows_per_batch
        if throttle_rows is not None:
            cap = min(cap, throttle_rows)
        rows = batch_df.select(text_col).limit(cap).collect()
        for r in rows:
            notify(r[text_col])

    return sink


def console_sink(df: DataFrame, num_rows: int = 20, mode: str = "append"):
    """Console probe (K7/S6: ``PRINT 'topic'``, ``SELECT ... EMIT CHANGES``
    at the CLI): starts a console-format streaming query."""
    return (
        df.writeStream.format("console")
        .outputMode(mode)
        .option("numRows", str(num_rows))
        .option("truncate", "true")
    )
