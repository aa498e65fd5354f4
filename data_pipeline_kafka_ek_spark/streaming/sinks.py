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
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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

    ``transport(index, docs)`` ships a batch of docs; the default appends
    JSON-lines under ``out_dir/<index>/``. Docs are keyed so an
    at-least-once retry is an idempotent upsert, like the real connector.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        stamped = with_extract_ts(batch_df)
        rows = stamped.toJSON().collect()
        docs, bad = [], []
        for raw in rows:
            try:
                d = json.loads(raw)
                # toJSON drops null-valued fields: a NULL key is a missing
                # field, not a parse error — dead-letter it with its own
                # reason (a doc without an id can't be idempotently upserted)
                if d.get(key_col) is None:
                    raise ValueError(f"null doc id ({key_col})")
                d["_id"] = str(d[key_col])
                docs.append(d)
            except Exception as exc:  # malformed doc or null id
                if not tolerant:
                    raise
                bad.append({"error": str(exc), "raw": raw})
        if transport is not None:
            transport(index, docs)
        else:
            os.makedirs(f"{out_dir}/{index}", exist_ok=True)
            with open(f"{out_dir}/{index}/batch_{batch_id}.jsonl", "a") as f:
                for d in docs:
                    f.write(json.dumps(d, default=str) + "\n")
        if bad:
            os.makedirs(f"{out_dir}/{index}__dlq", exist_ok=True)
            with open(f"{out_dir}/{index}__dlq/batch_{batch_id}.jsonl", "a") as f:
                for d in bad:
                    f.write(json.dumps(d) + "\n")

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


def mongo_sink(collection: str, key_col: str, out_dir: str, tolerant: bool = True):
    """Mongo sink twin (K4, reference: README.md:358-370): upsert-by-id
    document write; local twin is JSON-lines per collection. Rows with a
    NULL upsert key (toJSON drops null fields) are dead-lettered when
    ``tolerant`` — one bad row must not kill the streaming query."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = [json.loads(r) for r in batch_df.toJSON().collect()]
        good, bad = [], []
        for d in docs:
            if d.get(key_col) is None:
                if not tolerant:
                    raise ValueError(f"null upsert key ({key_col}): {d}")
                bad.append({"error": f"null upsert key ({key_col})", "doc": d})
                continue
            d["_id"] = str(d[key_col])
            good.append(d)
        os.makedirs(f"{out_dir}/{collection}", exist_ok=True)
        with open(f"{out_dir}/{collection}/batch_{batch_id}.jsonl", "a") as f:
            for d in good:
                f.write(json.dumps(d, default=str) + "\n")
        if bad:
            os.makedirs(f"{out_dir}/{collection}__dlq", exist_ok=True)
            with open(f"{out_dir}/{collection}__dlq/batch_{batch_id}.jsonl", "a") as f:
                for d in bad:
                    f.write(json.dumps(d, default=str) + "\n")

    return sink


def alert_sink(
    notify: Callable[[str], None],
    text_col: str = "alert_text",
    throttle_rows: int | None = None,
):
    """Slack/Pushbullet alert twin (K5/K6, reference:
    python_kafka_notify.py:41-53): per-row side effect through an injected
    ``notify(message)`` callable. Alert streams are tiny by construction
    (they sit behind highly selective filters), so collecting the batch to
    the driver is the correct shape — same as the reference's
    single-consumer design. ``throttle_rows`` caps per-batch sends (T9's
    deliberate throttling)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(text_col).collect()
        if throttle_rows is not None:
            rows = rows[:throttle_rows]
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
