"""Streaming semantics tests (SURVEY.md §5.2 layers 2-3): batch ≡ streaming
over replayed micro-batches, update-mode windowed aggregates, session
windows, CDC propagation, tolerant parsing, sink adapters."""

import datetime
import glob
import json
import os
import tempfile

from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.sources import cdc, kafka
from data_pipeline_kafka_ek_spark.sources.tables import load_table
from data_pipeline_kafka_ek_spark.streaming import runtime, sinks


def _final_windowed_state(df):
    """memory-sink update mode emits every state revision; final state is
    the last revision per (window, key)."""
    return {
        (r.window_start, r.event_type): r.event_count
        for r in df.orderBy("window_start").collect()
    }


def test_streaming_windowed_agg_equals_batch(spark, sf_dir):
    """The reference's windowed CTAS is incrementally maintained (A4/T1);
    replay events in 4 micro-batches and assert the final state equals the
    batch computation."""
    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.event_type): r.event_count
        for r in runtime.windowed_counts(events, watermark="100 days").collect()
    }
    stream = runtime.replayed_stream(spark, events, n_slices=4, order_col="ts")
    result = runtime.run_available_now(
        runtime.windowed_counts(stream, watermark="100 days"),
        output_mode="update",
    )
    streamed = _final_windowed_state(result)
    assert streamed == batch


def test_streaming_hopping_agg_multibatch_equals_batch(spark, sf_dir):
    """T3 streaming twin: hopping windows replayed in 4 micro-batches;
    max-per-key over the update-mode revisions (counts are monotone) must
    equal the batch computation — the reduction t_streaming_hopping_counts
    relies on."""
    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.event_type): r.event_count
        for r in runtime.windowed_counts(
            events, "30 minutes", slide="15 minutes", watermark="100 days"
        ).collect()
    }
    stream = runtime.replayed_stream(spark, events, n_slices=4, order_col="ts")
    revisions = runtime.run_available_now(
        runtime.windowed_counts(
            stream, "30 minutes", slide="15 minutes", watermark="100 days"
        ),
        output_mode="update",
    )
    streamed = {
        (r.window_start, r.event_type): r.event_count
        for r in revisions.groupBy("window_start", "event_type")
        .agg(F.max("event_count").alias("event_count"))
        .collect()
    }
    assert streamed == batch


def test_streaming_session_complete_mode_multibatch_equals_batch(spark, sf_dir):
    """T4 streaming twin: sessions MERGE across micro-batches (identity is
    unstable), so t_streaming_session_counts runs complete mode; the final
    memory-sink contents must equal the batch session_window result even
    when events arrive in 4 micro-batches."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    batch = {
        (r.session_start, r.session_end, r.user_id): r.event_count
        for r in runtime.session_windowed_counts(
            events, gap="5 minutes", watermark="100 days"
        ).collect()
    }
    stream = runtime.replayed_stream(spark, events, n_slices=4, order_col="ts")
    final = runtime.run_available_now(
        runtime.session_windowed_counts(stream, gap="5 minutes", watermark="100 days"),
        output_mode="complete",
    )
    streamed = {
        (r.session_start, r.session_end, r.user_id): r.event_count
        for r in final.collect()
    }
    assert streamed == batch


def test_session_window_runs_streaming(spark, sf_dir):
    """Session windows support append output only; with a tight watermark
    almost all sessions finalize before end-of-input, and the emitted
    sessions must agree with the batch computation."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 3)
    stream = runtime.replayed_stream(spark, events, n_slices=2, order_col="ts")
    out = runtime.run_available_now(
        runtime.session_windowed_counts(stream, gap="10 minutes", watermark="1 minute"),
        output_mode="append",
    )
    streamed = {
        (r.session_start, r.user_id): r.event_count for r in out.collect()
    }
    batch = {
        (r.session_start, r.user_id): r.event_count
        for r in runtime.session_windowed_counts(events, gap="10 minutes").collect()
    }
    assert len(streamed) > 0
    # every finalized streamed session matches its batch twin exactly
    assert all(batch.get(k) == v for k, v in streamed.items())


def test_streaming_session_append_mode_emits_exactly_closed_sessions(spark, sf_dir):
    """The scale-safe T4 shape (t_streaming_session_append): append mode +
    finite watermark emits each session exactly once after it closes. A
    4-micro-batch replay must yield EXACTLY the batch sessions whose end
    precedes the final watermark (max event time, ms-truncated, minus the
    delay) — no missing closed sessions, no open sessions leaking out."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    stream = runtime.replayed_stream(spark, events, n_slices=4, order_col="ts")
    out = runtime.run_available_now(
        runtime.session_windowed_counts(stream, gap="5 minutes", watermark="1 hour"),
        output_mode="append",
    )
    streamed = {
        (r.session_start, r.session_end, r.user_id): r.event_count
        for r in out.collect()
    }
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cut = max_ts.replace(microsecond=max_ts.microsecond // 1000 * 1000) - (
        datetime.timedelta(hours=1)
    )
    # the closed-session predicate must see the RAW window end (the
    # formatted session_end truncates to seconds, which would misclassify
    # sessions ending inside the cut's own second)
    batch_raw = events.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("event_count"))
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    closed_df = batch_raw.filter(F.col("w.end") < F.lit(cut)).select(
        fmt("w.start").alias("session_start"),
        fmt("w.end").alias("session_end"),
        "user_id",
        "event_count",
    )
    closed = {
        (r.session_start, r.session_end, r.user_id): r.event_count
        for r in closed_df.collect()
    }
    open_sessions = batch_raw.count() - len(closed)
    assert open_sessions > 0, "fixture must leave some sessions open at the cut"
    assert streamed == closed


def test_watermark_drops_late_rows(spark):
    """T5: with a tight watermark, an event far behind the max seen
    event-time is dropped from the aggregation (divergence from ksqlDB's
    retention-window updates is deliberate and documented)."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    on_time = [(i, base + datetime.timedelta(minutes=i), "a") for i in range(60)]
    late = [(99, base - datetime.timedelta(hours=2), "a")]
    df = spark.createDataFrame(on_time + late, ["event_id", "ts", "event_type"])
    # late row in its own trailing micro-batch: order by event_id puts it last
    stream = runtime.replayed_stream(spark, df, n_slices=3, order_col="event_id")
    strict = runtime.run_available_now(
        runtime.windowed_counts(stream, window_duration="15 minutes", watermark="10 minutes"),
        output_mode="append",  # append emits only finalized windows
    )
    counted = sum(r.event_count for r in strict.collect())
    assert counted <= 60  # the -2h row must not appear in any finalized window


def test_cdc_apply_update_propagation(spark, tmp_path):
    """The reference's live mutation experiment (README.md:204-210): an
    upstream UPDATE changes what subsequent joins see."""
    tbl = cdc.MaterializedTable(spark, str(tmp_path / "customers"), "id", "update_ts")
    t0 = datetime.datetime(2024, 1, 1)
    tbl.apply_batch(
        spark.createDataFrame(
            [(42, "Rick", "bronze", t0), (1, "Rica", "gold", t0)],
            ["id", "name", "club_status", "update_ts"],
        )
    )
    assert {r.id: r.club_status for r in tbl.read().collect()}[42] == "bronze"
    # upstream UPDATE arrives
    tbl.apply_batch(
        spark.createDataFrame(
            [(42, "Rick", "platinum", t0 + datetime.timedelta(minutes=1))],
            ["id", "name", "club_status", "update_ts"],
        )
    )
    state = {r.id: r.club_status for r in tbl.read().collect()}
    assert state == {42: "platinum", 1: "gold"}
    # re-delivery of the same batch (at-least-once) is idempotent
    tbl.apply_batch(
        spark.createDataFrame(
            [(42, "Rick", "platinum", t0 + datetime.timedelta(minutes=1))],
            ["id", "name", "club_status", "update_ts"],
        )
    )
    assert tbl.read().count() == 2


def test_unwrap_debezium_insert_update_delete(spark):
    rows = [
        ({"id": 1, "name": "a"}, None, "c", 100),
        ({"id": 1, "name": "b"}, {"id": 1, "name": "a"}, "u", 200),
        (None, {"id": 1, "name": "b"}, "d", 300),
    ]
    df = spark.createDataFrame(rows, "after struct<id:int,name:string>, before struct<id:int,name:string>, op string, ts_ms long")
    out = cdc.unwrap_debezium(df).collect()
    assert [r.id for r in out] == [1, 1, 1]
    assert [r["__deleted"] for r in out] == [False, False, True]
    # delete then apply -> empty table
    applied = cdc.apply_changes(None, cdc.unwrap_debezium(df), "id", [F.desc("ts_ms")])
    assert applied.count() == 0


def test_parse_json_tolerant_dead_letters(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not-json"), (3, '{"k": 7}')], ["event_id", "props"]
    )
    good, dlq = runtime.parse_json_tolerant(df, "props", "k int")
    assert {r.k for r in good.collect()} == {5, 7}
    assert [r.event_id for r in dlq.collect()] == [2]


def test_parse_json_tolerant_null_and_empty_payloads_dead_letter(spark):
    # Kafka tombstones (NULL value) and empty/whitespace payloads parse to a
    # NULL struct with no _corrupt_record — they must land in the DLQ, not
    # enter the good stream as all-NULL rows.
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, None), (3, ""), (4, "   "), (5, '{"k": 6}')],
        "event_id int, props string",
    )
    good, dlq = runtime.parse_json_tolerant(df, "props", "k int")
    assert {r.k for r in good.collect()} == {5, 6}
    assert sorted(r.event_id for r in dlq.collect()) == [2, 3, 4]
    # exact partition: every input row lands in exactly one side
    assert good.count() + dlq.count() == df.count()


def test_elasticsearch_sink_doc_id_and_extract_ts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "es")
    df = load_table(spark, sf_dir, "events").limit(5)
    sink = sinks.elasticsearch_sink("ratings", "event_id", out)
    sink(df, 0)
    files = glob.glob(f"{out}/ratings/*.jsonl")
    assert len(files) >= 1
    docs = [json.loads(l) for f in files for l in open(f)]
    assert len(docs) == 5
    assert all("_id" in d and "extract_ts" in d for d in docs)
    # idempotency-by-key: _id equals the event_id (reference key.ignore=false)
    assert {d["_id"] for d in docs} == {str(d["event_id"]) for d in docs}


def test_windowed_counts_late_data_policy(spark):
    """Pins the documented T5 late-data policy (streaming/runtime.py:15 —
    ksqlDB keeps windows open for the retention period; this engine uses
    an explicit watermark knob): a replayed row older than the watermark
    allows is DROPPED from its closed window, while a late row whose
    window is still open REVISES it in update mode.

    One Spark ≥3.4 subtlety this test pins on purpose: late-event
    FILTERING uses the watermark as of the previous micro-batch, while
    state EVICTION uses the current one — so a row only drops one batch
    AFTER the batch whose max event time pushed the watermark past its
    window (here: 11:0x arrives in slice 2, the watermark crosses 10:15
    during slice 3, and the replayed 10:05 row in slice 4 is dropped)."""

    def ts(s):
        return datetime.datetime.fromisoformat(s)

    rows = [
        # slice 1: the 10:00 window builds state (count 2)
        (0, ts("2024-01-01 10:00:00"), "a"),
        (1, ts("2024-01-01 10:05:00"), "a"),
        # slice 2: event time jumps an hour -> eviction watermark will
        # reach 10:51 in the NEXT batch
        (2, ts("2024-01-01 11:00:00"), "a"),
        (3, ts("2024-01-01 11:01:00"), "a"),
        # slice 3: runs with late-filter watermark 09:55 / eviction 10:51;
        # the [10:00,10:15) state is evicted at the END of this batch
        (4, ts("2024-01-01 11:02:00"), "a"),
        (5, ts("2024-01-01 10:56:00"), "a"),
        # slice 4: late-filter watermark is now 10:51 — the replayed
        # 10:05 row is DROPPED; 10:57 lands in the still-open
        # [10:45,11:00) window and revises it
        (6, ts("2024-01-01 10:05:00"), "a"),
        (7, ts("2024-01-01 10:57:00"), "a"),
    ]
    df = spark.createDataFrame(rows, "seq int, ts timestamp, event_type string")
    stream = runtime.replayed_stream(spark, df, n_slices=4, order_col="seq")
    out = runtime.windowed_counts(
        stream, "15 minutes", watermark="10 minutes"
    )
    got = _final_windowed_state(runtime.run_available_now(out, "update"))
    assert got == {
        ("2024-01-01 10:00:00", "a"): 2,  # replayed late row did NOT bump to 3
        ("2024-01-01 10:45:00", "a"): 2,  # within-watermark late row revises
        ("2024-01-01 11:00:00", "a"): 3,
    }


class _StubHttpServer:
    """In-process stdlib HTTP stub: captures every request, answers with a
    fixed status. Executors (Python workers) reach it over localhost TCP,
    so foreachPartition transports are exercised at the wire level."""

    def __init__(self, status: int = 200, body: bytes = b'{"errors":false}'):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.requests: list[tuple[str, str, bytes]] = []
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def _handle(self):
                n = int(self.headers.get("Content-Length") or 0)
                stub.requests.append(
                    (
                        self.path,
                        self.headers.get("Content-Type") or "",
                        self.rfile.read(n),
                    )
                )
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            do_POST = do_GET = _handle

            def log_message(self, *args):  # quiet
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self._srv.server_port}"
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()


def test_elasticsearch_sink_http_bulk_wire(spark, tmp_path):
    """K1 at the WIRE level: the sink's bulk POST body is the connector's
    NDJSON format — action line with _index/_id from the key column, then
    the source doc with EXTRACT_TS injected, nulls absent, no _id echo."""
    srv = _StubHttpServer(status=200)
    try:
        df = spark.createDataFrame(
            [(1, "fine"), (2, None)], "event_id long, msg string"
        ).coalesce(1)
        sink = sinks.elasticsearch_sink(
            "ratings",
            "event_id",
            str(tmp_path / "es"),
            transport=sinks.es_http_transport(srv.url),
        )
        sink(df, 0)
    finally:
        srv.close()
    assert [p for p, _, _ in srv.requests] == ["/_bulk"]
    _, ctype, payload = srv.requests[0]
    assert ctype == "application/x-ndjson"
    lines = [json.loads(l) for l in payload.decode().strip().split("\n")]
    actions, sources = lines[0::2], lines[1::2]
    assert [a["index"]["_id"] for a in actions] == ["1", "2"]
    assert all(a["index"]["_index"] == "ratings" for a in actions)
    assert sources[0]["msg"] == "fine" and "extract_ts" in sources[0]
    assert "msg" not in sources[1]          # null fields are absent
    assert all("_id" not in s for s in sources)
    # nothing fell back to the file twin and nothing dead-lettered
    assert not glob.glob(str(tmp_path / "es" / "**" / "*.jsonl"))


def test_elasticsearch_sink_http_4xx_tolerant_dead_letters(spark, tmp_path):
    """behavior.on.error=tolerant at the wire level: a 4xx bulk response
    dead-letters the partition batch instead of failing the stream; the
    strict sink surfaces the failure."""
    import pytest

    srv = _StubHttpServer(status=400, body=b'{"error":"mapper_parsing"}')
    try:
        df = spark.createDataFrame([(1, "x")], "event_id long, msg string")
        out = str(tmp_path / "es")
        sinks.elasticsearch_sink(
            "idx", "event_id", out,
            tolerant=True, transport=sinks.es_http_transport(srv.url),
        )(df, 0)
        dlq = [
            json.loads(l)
            for f in glob.glob(f"{out}/idx__dlq/*.jsonl")
            for l in open(f)
        ]
        assert len(dlq) == 1 and "transport" in dlq[0]["error"]
        assert json.loads(dlq[0]["doc"])["event_id"] == 1

        with pytest.raises(Exception, match="400|HTTP|transport|Bad"):
            sinks.elasticsearch_sink(
                "idx", "event_id", out,
                tolerant=False, transport=sinks.es_http_transport(srv.url),
            )(df, 1)
    finally:
        srv.close()


def test_streaming_asof_point_in_time_across_microbatches(spark):
    """The reference's defining join semantics (README.md:204-210), as-of
    edition: each purchase micro-batch joins the click table's state AT
    PROCESSING TIME. A click that arrives in a later micro-batch — even
    with an earlier event-time — must not rewrite earlier matches, while
    purchases processed after it must see it."""

    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    # one purchase per micro-batch (order_col keeps replay order)
    purchases = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(20)), (3, 1, ts(30))],
        "purchase_id long, user_id long, ts timestamp",
    )
    # clicks arriving between micro-batches; the batch-1 arrival has an
    # EVENT time (5s) before purchase 1 (10s) — processing-time semantics
    # mean purchase 1 (processed in batch 0) must NOT see it
    click_arrivals = {
        0: [(100, 1, ts(2))],
        1: [(101, 1, ts(5))],
        2: [(102, 1, ts(25))],
    }
    clicks_so_far: list[tuple] = []
    results: dict[int, list] = {}

    def right_for_batch(batch_id: int):
        clicks_so_far.extend(click_arrivals.get(batch_id, []))
        return spark.createDataFrame(
            clicks_so_far, "click_id long, user_id long, ts timestamp"
        )

    def sink(df, batch_id: int) -> None:
        results[batch_id] = df.collect()

    stream = runtime.replayed_stream(spark, purchases, n_slices=3, order_col="purchase_id")
    q = runtime.asof_join_per_batch(
        stream, right_for_batch, sink, key="user_id", right_cols=["click_id"]
    )
    q.awaitTermination()

    matched = {
        r.purchase_id: r.click_id for rows in results.values() for r in rows
    }
    # purchase 1 (batch 0): only click 100@2s had arrived -> 100, NOT the
    # later-arriving click 101@5s even though 5s <= 10s by event time
    # purchase 2 (batch 1): click 101@5s has now arrived and is the latest
    # at-or-before 20s; purchase 3 (batch 2): click 102@25s
    assert matched == {1: 100, 2: 101, 3: 102}
    # exactly one output row per purchase, each emitted in its own batch
    assert sorted(len(v) for v in results.values()) == [1, 1, 1]


def test_sink_files_keep_umask_default_permissions(spark, sf_dir, tmp_path):
    """mkstemp creates 0600 temp files; the published .jsonl must be
    readable per the process umask so downstream consumers running as
    another user keep read access."""
    import os

    out = str(tmp_path / "es_perm")
    df = load_table(spark, sf_dir, "events").limit(3)
    sinks.elasticsearch_sink("ratings", "event_id", out)(df, 0)
    files = glob.glob(f"{out}/ratings/*.jsonl")
    assert files
    expected = 0o666 & ~sinks._UMASK
    for f in files:
        assert (os.stat(f).st_mode & 0o777) == expected


def test_replayed_stream_removes_staging_dir(spark):
    """replayed_stream must not leak its write-staging directory (the
    replay dir itself lives until the stream is consumed)."""
    import glob as g
    import tempfile

    pattern = f"{tempfile.gettempdir()}/replay_stage_*"
    before = set(g.glob(pattern))
    df = spark.range(20).select(
        F.col("id").alias("event_id"), (F.col("id") % 3).alias("user_id")
    )
    runtime.replayed_stream(spark, df, n_slices=2, order_col="event_id")
    assert set(g.glob(pattern)) == before


def test_alert_sink_formats_and_throttles(spark, sf_dir):
    sent = []
    df = spark.createDataFrame(
        [("u1 left a bad review",), ("u2 left a bad review",), ("u3 left a bad review",)],
        ["alert_text"],
    )
    sinks.alert_sink(sent.append, throttle_rows=2)(df, 0)
    assert len(sent) == 2 and sent[0].endswith("bad review")


def test_kafka_encode_decode_roundtrip(spark, sf_dir):
    """The Kafka envelope transforms (the testable part of S1/K3 without a
    broker): encode to (key, value JSON) then decode back."""
    df = load_table(spark, sf_dir, "events").limit(10).select("event_id", "user_id", "event_type")
    enc = kafka.encode_value(df, "event_id")
    assert enc.columns == ["key", "value"]
    parsed = enc.select(
        F.from_json("value", "event_id long, user_id long, event_type string").alias("v")
    ).select("v.*")
    assert sorted(map(tuple, parsed.collect())) == sorted(map(tuple, df.collect()))


def test_rekey_for_sink_sets_key(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").limit(10)
    out = runtime.rekey_for_sink(df, "event_type")
    assert "key" in out.columns
    assert out.select("key").distinct().count() <= 5


def test_streaming_hopping_window_equals_batch(spark, sf_dir):
    """Hopping windows (T3): replayed 3-batch stream's final update-mode
    state equals the batch computation — every event lands in
    size/slide = 2 windows in both modes."""
    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.event_type): r.event_count
        for r in runtime.windowed_counts(
            events, "30 minutes", slide="15 minutes", watermark="100 days"
        ).collect()
    }
    stream = runtime.replayed_stream(spark, events, n_slices=3, order_col="ts")
    result = runtime.run_available_now(
        runtime.windowed_counts(stream, "30 minutes", slide="15 minutes", watermark="100 days"),
        output_mode="update",
    )
    assert _final_windowed_state(result) == batch


def test_stream_dedup_first_occurrence_kept(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): duplicated
    events across micro-batches collapse to one row per key."""
    events = load_table(spark, sf_dir, "events").limit(200)
    doubled = events.union(events)  # every event appears twice
    stream = runtime.replayed_stream(spark, doubled, n_slices=4)
    result = runtime.run_available_now(
        runtime.stream_dedup(stream, ["event_id"], watermark="100 days"),
        output_mode="append",
    )
    got = sorted(r.event_id for r in result.select("event_id").collect())
    want = sorted(r.event_id for r in events.select("event_id").collect())
    assert got == want


def test_running_counts_stateful_final_state_equals_batch(spark, sf_dir):
    """applyInPandasWithState custom operator: final per-key state across
    replayed micro-batches equals the batch aggregate."""
    events = load_table(spark, sf_dir, "events").limit(500)
    batch = {
        r.user_id: (r.event_count, round(r.value_total, 4))
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("value").alias("value_total"),
        )
        .collect()
    }
    stream = runtime.replayed_stream(spark, events, n_slices=3, order_col="ts")
    result = runtime.run_available_now(
        runtime.running_counts_stateful(stream, watermark="100 days"),
        output_mode="update",
    )
    # update mode: last emission per key is the final state
    final = {}
    for r in result.collect():
        cur = final.get(r.user_id, (0, 0.0))
        if r.event_count >= cur[0]:
            final[r.user_id] = (r.event_count, round(r.value_total, 4))
    assert final == batch


def test_streaming_enrichment_join_equals_batch(spark, sf_dir):
    """The reference's flagship stream-table join (J1) as a real streaming
    query: replayed event stream joined against the static customer
    dimension (Spark re-reads the static side per micro-batch — the
    'current table state' semantics); final output equals the batch plan."""
    from data_pipeline_kafka_ek_spark.plans import reference as ref

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    batch = sorted(
        (r.event_id, r.customer_label)
        for r in ref.unhappy_vip_customers(events, customer).collect()
    )
    stream = runtime.replayed_stream(spark, events, n_slices=3, order_col="ts")
    streamed_df = runtime.run_available_now(
        ref.unhappy_vip_customers(stream, customer), output_mode="append"
    )
    streamed = sorted(
        (r.event_id, r.customer_label) for r in streamed_df.collect()
    )
    assert streamed == batch


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream event-time interval join (a Spark capability beyond
    the reference's stream-table join; NOT a J1 substitute — SURVEY §7.3):
    error events joined to the same user's clean events within the
    following 10 minutes. Both sides watermarked; streamed result over
    replayed micro-batches equals the batch join."""
    events = load_table(spark, sf_dir, "events")
    err_b = events.filter(F.lower("event_type").like("%err%")).select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    ok_b = events.filter(~F.lower("event_type").like("%err%")).select(
        F.col("event_id").alias("ok_id"),
        F.col("user_id").alias("ok_user"),
        F.col("ts").alias("ok_ts"),
    )
    cond_b = (
        (F.col("err_user") == F.col("ok_user"))
        & (F.col("ok_ts") >= F.col("err_ts"))
        & (F.col("ok_ts") <= F.col("err_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    batch = sorted(
        (r.err_id, r.ok_id) for r in err_b.join(ok_b, cond_b).collect()
    )

    stream = runtime.replayed_stream(spark, events, n_slices=3, order_col="ts")
    err_s = (
        stream.filter(F.lower("event_type").like("%err%"))
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "100 days")
    )
    ok_s = (
        stream.filter(~F.lower("event_type").like("%err%"))
        .select(
            F.col("event_id").alias("ok_id"),
            F.col("user_id").alias("ok_user"),
            F.col("ts").alias("ok_ts"),
        )
        .withWatermark("ok_ts", "100 days")
    )
    cond_s = (
        (F.col("err_user") == F.col("ok_user"))
        & (F.col("ok_ts") >= F.col("err_ts"))
        & (F.col("ok_ts") <= F.col("err_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    joined = runtime.run_available_now(err_s.join(ok_s, cond_s), output_mode="append")
    streamed = sorted((r.err_id, r.ok_id) for r in joined.collect())
    assert streamed == batch


def test_decode_value_json_roundtrip(spark, sf_dir):
    """decode_value on a Kafka-shaped frame: metadata kept, payload typed
    (regression: the meta columns were re-selected after renaming)."""
    events = load_table(spark, sf_dir, "events").limit(20)
    shaped = kafka.encode_value(events, "user_id").select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    decoded = kafka.decode_value(
        shaped, "event_id long, user_id long, value double"
    )
    rows = decoded.collect()
    assert len(rows) == 20
    assert {"kafka_key", "kafka_topic", "kafka_offset", "event_id", "user_id"} <= set(
        decoded.columns
    )
    want = {(r.event_id, r.user_id) for r in events.select("event_id", "user_id").collect()}
    assert {(r.event_id, r.user_id) for r in rows} == want


def test_document_sinks_ship_per_partition_not_via_driver(spark, sf_dir, tmp_path):
    """K1 carries the full ratings stream: docs must ship from executors,
    one write per non-empty partition (file named by partition id), with
    nothing funneled through a driver-side collect. Retries overwrite
    (mode w), so re-running a batch is idempotent."""
    out = str(tmp_path / "es")
    df = load_table(spark, sf_dir, "events").limit(40).repartition(4)
    sink = sinks.elasticsearch_sink("ratings", "event_id", out)
    sink(df, 7)
    files = sorted(glob.glob(f"{out}/ratings/batch_7_p*.jsonl"))
    assert len(files) == 4, files  # one file per non-empty partition
    docs = [json.loads(l) for f in files for l in open(f)]
    assert len(docs) == 40
    assert {d["_id"] for d in docs} == {str(d["event_id"]) for d in docs}
    # idempotent retry: same batch re-run overwrites, no duplicates
    sink(df, 7)
    docs2 = [
        json.loads(l)
        for f in glob.glob(f"{out}/ratings/batch_7_p*.jsonl")
        for l in open(f)
    ]
    assert len(docs2) == 40

    mg = sinks.mongo_sink("coll", "event_id", str(tmp_path / "mg"))
    mg(df, 0)
    mfiles = glob.glob(str(tmp_path / "mg/coll/batch_0_p*.jsonl"))
    assert len(mfiles) == 4
    assert sum(1 for f in mfiles for _ in open(f)) == 40


def test_es_and_mongo_sinks_dead_letter_null_keys(spark, tmp_path):
    """A NULL doc/upsert key must dead-letter the row, not kill the batch
    or mislabel it a parse failure."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=None, v="b"), Row(k=3, v="c")]
    )
    es = sinks.elasticsearch_sink("idx", "k", str(tmp_path / "es"))
    es(df, 0)
    import glob as g

    good = [json.loads(l) for f in g.glob(str(tmp_path / "es/idx/*.jsonl")) for l in open(f)]
    dlq = [json.loads(l) for f in g.glob(str(tmp_path / "es/idx__dlq/*.jsonl")) for l in open(f)]
    assert {d["_id"] for d in good} == {"1", "3"}
    assert len(dlq) == 1 and "null doc id" in dlq[0]["error"]

    mg = sinks.mongo_sink("coll", "k", str(tmp_path / "mg"))
    mg(df, 0)
    mgood = [json.loads(l) for f in g.glob(str(tmp_path / "mg/coll/*.jsonl")) for l in open(f)]
    mdlq = [json.loads(l) for f in g.glob(str(tmp_path / "mg/coll__dlq/*.jsonl")) for l in open(f)]
    assert {d["_id"] for d in mgood} == {"1", "3"}
    assert len(mdlq) == 1


def test_materialized_table_rewrites_only_touched_buckets(spark, tmp_path):
    """Incremental MERGE layout: a change batch must rewrite only the
    hash-buckets its keys fall in; untouched bucket files stay byte-
    identical (checked via mtime+size), and deletes that empty a bucket
    clear its directory."""
    import os as _os
    import time as _time

    from pyspark.sql import Row

    from data_pipeline_kafka_ek_spark.sources.cdc import MaterializedTable

    t = MaterializedTable(spark, str(tmp_path / "dim"), "id", "ver", n_buckets=4)
    seed = spark.createDataFrame(
        [Row(id=i, val=f"v{i}", ver=1, __deleted=False) for i in range(20)]
    )
    t.apply_batch(seed)
    assert t.read().count() == 20

    def snapshot():
        out = {}
        for root, _, files in _os.walk(str(tmp_path / "dim")):
            for f in files:
                p = _os.path.join(root, f)
                out[p] = (_os.path.getmtime(p), _os.path.getsize(p))
        return out

    before = snapshot()
    _time.sleep(1.1)  # mtime granularity
    # update one key -> exactly one bucket touched
    upd = spark.createDataFrame([Row(id=7, val="v7b", ver=2, __deleted=False)])
    t.apply_batch(upd)
    after = snapshot()
    touched_dirs = {
        os.path.dirname(p)
        for p in after
        if p not in before or after[p] != before[p]
    }
    bucket_dirs = {d for d in touched_dirs if "__bucket=" in d}
    assert len(bucket_dirs) == 1, f"expected 1 rewritten bucket, got {bucket_dirs}"
    got = {r.id: r.val for r in t.read().collect()}
    assert got[7] == "v7b" and len(got) == 20

    # delete every key in one bucket -> that bucket directory disappears
    from pyspark.sql import functions as _F

    bucketed = t.read().withColumn("b", _F.pmod(_F.hash("id"), _F.lit(4)))
    target_b = bucketed.first()["b"]
    victims = [r.id for r in bucketed.filter(_F.col("b") == target_b).collect()]
    dels = spark.createDataFrame(
        [(i, None, 3, True) for i in victims],
        "id bigint, val string, ver bigint, __deleted boolean",
    )
    t.apply_batch(dels)
    assert not _os.path.exists(str(tmp_path / "dim" / f"__bucket={target_b}"))
    assert t.read().count() == 20 - len(victims)


def test_rate_events_generator_shape(spark):
    """S4 Datagen twin: the rate-source generator emits the synthetic
    ratings schema with deterministic column synthesis (bounded user ids,
    known event types, parseable props JSON)."""
    df = runtime.rate_events(spark, rows_per_second=50, user_cardinality=7)
    q = (
        df.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_rate_"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _t

    deadline = _t.time() + 30
    while _t.time() < deadline and spark.table("rate_probe").count() < 20:
        _t.sleep(0.2)
    q.stop()
    q.awaitTermination()
    rows = spark.table("rate_probe").collect()
    assert len(rows) >= 20
    assert {"event_id", "ts", "user_id", "event_type", "value", "props"} <= set(
        rows[0].asDict()
    )
    assert all(0 <= r.user_id < 7 for r in rows)
    assert all(
        r.event_type in {"click", "view", "purchase", "signup", "error"} for r in rows
    )
    # synthesis is a pure function of the sequence value
    by_id = {r.event_id: r for r in rows}
    for eid, r in by_id.items():
        assert r.user_id == eid % 7
        assert json.loads(r.props)["k"] == eid % 100


def test_stateful_aggregation_checkpoint_restart(spark, sf_dir, tmp_path):
    """Stop a WINDOWED (stateful) streaming aggregation mid-stream and
    restart on the same checkpoint: state is recovered and the final
    answer equals the batch aggregate — the recovery property that makes
    EMIT CHANGES durable (reference keeps ksqlDB state in RocksDB for the
    same reason)."""
    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.event_type): r.event_count
        for r in runtime.windowed_counts(events, watermark="100 days").collect()
    }
    src = str(tmp_path / "src")
    events.repartitionByRange(6, F.col("ts")).write.mode("overwrite").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = runtime.windowed_counts(stream, watermark="100 days")
        # parquet sink requires append; complete/update need a queryable
        # sink — use foreachBatch writing the latest full state per batch
        def write_state(bdf, bid):
            bdf.write.mode("overwrite").parquet(out)

        return (
            agg.writeStream.foreachBatch(write_state)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    import time as _t

    q = start()
    deadline = _t.time() + 60
    while _t.time() < deadline:
        if q.lastProgress and q.lastProgress["batchId"] >= 2:
            break
        _t.sleep(0.2)
    q.stop()
    q.awaitTermination()

    q2 = start()
    deadline = _t.time() + 120
    final = {}
    while _t.time() < deadline:
        if q2.lastProgress and q2.lastProgress["numInputRows"] == 0:
            try:
                cur = {
                    (r.window_start, r.event_type): r.event_count
                    for r in spark.read.parquet(out).collect()
                }
                if cur == batch:
                    final = cur
                    break
            except Exception:
                pass
        _t.sleep(0.5)
    q2.stop()
    q2.awaitTermination()
    assert final == batch, "restarted stateful aggregation diverged from batch"


def test_materialized_table_works_against_file_uri(spark, tmp_path):
    """The merge layout must go through the Hadoop FileSystem API (not
    POSIX os/shutil), so the same class is object-store-safe: run the full
    seed/update/delete cycle against an explicit file:/ URI and confirm
    the class source has no direct os/shutil calls."""
    import inspect

    from pyspark.sql import Row

    from data_pipeline_kafka_ek_spark.sources.cdc import MaterializedTable

    uri = (tmp_path / "dim_uri").as_uri()  # file:///...
    t = MaterializedTable(spark, uri, "id", "ver", n_buckets=4)
    assert not t.exists()
    seed = spark.createDataFrame(
        [Row(id=i, val=f"v{i}", ver=1, __deleted=False) for i in range(20)]
    )
    t.apply_batch(seed)
    assert t.exists()
    assert t.read().count() == 20

    upd = spark.createDataFrame([Row(id=7, val="v7b", ver=2, __deleted=False)])
    t.apply_batch(upd)
    got = {r.id: r.val for r in t.read().collect()}
    assert got[7] == "v7b" and len(got) == 20

    # delete every key of one bucket through the URI path: the bucket dir
    # must be cleared via fs.delete, observable through t.exists()/read()
    bucketed = t.read().withColumn("b", F.pmod(F.hash("id"), F.lit(4)))
    target_b = bucketed.first()["b"]
    victims = [r.id for r in bucketed.filter(F.col("b") == target_b).collect()]
    dels = spark.createDataFrame(
        [(i, None, 3, True) for i in victims],
        "id bigint, val string, ver bigint, __deleted boolean",
    )
    t.apply_batch(dels)
    assert t.read().count() == 20 - len(victims)
    fs, bdir = t._fs_path(f"{uri}/__bucket={target_b}")
    assert not fs.exists(bdir)

    src = inspect.getsource(MaterializedTable)
    for banned in ("os.listdir", "os.path", "os.remove", "shutil.", "import shutil"):
        assert banned not in src, f"POSIX call {banned!r} in MaterializedTable"


def test_stream_stream_interval_join_spans_batches(spark):
    """Stream-stream interval join: a purchase in a LATE micro-batch must
    match a click from an EARLIER one (the right row is buffered in join
    state across batches), and only clicks inside [l.ts - lookback, l.ts]
    qualify."""
    base = "2024-01-01 00:{:02d}:00"
    clicks = spark.createDataFrame(
        [(100 + m, 1, base.format(m)) for m in (0, 10, 50)],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = spark.createDataFrame(
        [(200, 1, base.format(30)), (201, 2, base.format(30))],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    ls = runtime.replayed_stream(spark, purchases, n_slices=2, order_col="ts")
    rs = runtime.replayed_stream(spark, clicks, n_slices=3, order_col="ts")
    out = runtime.run_available_now(
        runtime.stream_stream_interval_join(
            ls, rs, key="user_id", lookback="25 minutes", watermark="100 days"
        ).select(
            F.col("l.event_id").alias("purchase_id"),
            F.col("r.event_id").alias("click_id"),
        ),
        output_mode="append",
    )
    got = {(r.purchase_id, r.click_id) for r in out.collect()}
    # purchase 200 @00:30 matches only click 110 @00:10 (00:00 is outside
    # the 25-min lookback [00:05, 00:30], 00:50 is after); purchase 201 is
    # user 2 — no click
    assert got == {(200, 110)}


def test_streaming_funnel_equals_batch(spark, sf_dir):
    """The stateful streaming funnel's final per-step counts must equal the
    single-pass batch funnel over the same events (batch ≡ streaming,
    SURVEY.md §5.2 layer 2) — exercised through a real multi-micro-batch
    ordered replay by the catalog entry."""
    import __spark_entry__ as em

    qs = em.queries()
    batch = {(r.step_idx, r.step): r.users for r in qs["x_events_funnel"](spark, sf_dir).collect()}
    stream = {(r.step_idx, r.step): r.users for r in qs["t_streaming_funnel"](spark, sf_dir).collect()}
    assert batch == stream and len(batch) == 3


def test_stream_neardup_flags_cross_batch_duplicates(spark):
    """The first-wins band automaton must flag a near-duplicate that
    arrives in a LATER micro-batch than its original (state carries the
    bucket claimants across batches), must not flag unrelated docs, and
    dup_of must point at the earliest claimant."""
    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [
            (0, base + "alpha"),
            (1, "completely different content with no overlap at all xyzzy"),
            # near-dup of doc 0 (one-word tail change): lands in batch 2
            (2, base + "beta"),
            # exact dup of doc 0: shares every band
            (3, base + "alpha"),
        ],
        "doc_id long, text string",
    )
    stream = runtime.replayed_stream(spark, docs, n_slices=4, order_col="doc_id")
    hits = runtime.run_available_now(
        runtime.stream_neardup_minhash(stream), output_mode="append"
    )
    per_doc = {
        r.doc_id: r.dup_of
        for r in hits.groupBy("doc_id")
        .agg(F.min("first_doc_id").alias("dup_of"))
        .collect()
    }
    assert per_doc.get(3) == 0, per_doc  # exact dup always collides
    assert 1 not in per_doc, per_doc  # unrelated doc never flagged
    assert 0 not in per_doc, per_doc  # the original is not its own dup
    # the near-dup shares at least the bands untouched by the tail change;
    # with 8 repeated-token shingles the signature is dominated by the
    # shared tokens, so doc 2 must collide too
    assert per_doc.get(2) == 0, per_doc


class _StubMongoServer:
    """In-process stub speaking just enough MongoDB wire protocol: accepts
    connections, parses OP_MSG update commands, records them, replies
    ``{ok: 1.0, n: ...}``. Executors reach it over localhost TCP, so the
    foreachPartition transport is exercised at the BSON/OP_MSG level."""

    def __init__(self, ok: float = 1.0):
        import socket
        import threading

        from data_pipeline_kafka_ek_spark.streaming import mongo_wire as mw

        self.commands: list[dict] = []
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(16)
        self.port = self._sock.getsockname()[1]
        self._stop = False

        def serve():
            while not self._stop:
                try:
                    conn, _ = self._sock.accept()
                except OSError:
                    return
                with conn:
                    try:
                        req_id, _, cmd = mw.parse_op_msg(mw._recv_frame(conn))
                        self.commands.append(cmd)
                        n = len(cmd.get("updates", []))
                        conn.sendall(
                            mw.op_msg(
                                {"ok": ok, "n": n}, request_id=100,
                                response_to=req_id,
                            )
                        )
                    except Exception:
                        return

        self._thread = threading.Thread(target=serve, daemon=True)
        self._thread.start()

    def close(self):
        self._stop = True
        self._sock.close()


def test_mongo_sink_op_msg_wire_upserts(spark, tmp_path):
    """K4 at the WIRE level: the sink ships one OP_MSG ``update`` command
    per partition batch — replace-by-_id with upsert:true per doc (the
    connector's idempotent delivery), BSON round-tripped by the stub."""
    from data_pipeline_kafka_ek_spark.streaming import mongo_wire as mw

    srv = _StubMongoServer()
    try:
        df = spark.createDataFrame(
            [(1, "good", 4.5), (2, None, 1.0)],
            "event_id long, msg string, value double",
        ).coalesce(1)
        sinks.mongo_sink(
            "ratings", "event_id", str(tmp_path / "mongo"),
            transport=mw.MongoWireTransport("127.0.0.1", srv.port, db="demo"),
        )(df, 0)
    finally:
        srv.close()
    assert len(srv.commands) == 1
    cmd = srv.commands[0]
    assert cmd["update"] == "ratings" and cmd["$db"] == "demo"
    ups = cmd["updates"]
    assert [u["q"]["_id"] for u in ups] == ["1", "2"]
    assert all(u["upsert"] is True and u["multi"] is False for u in ups)
    # replacement documents (no $-operators): dropped fields don't linger
    assert ups[0]["u"]["msg"] == "good"
    assert ups[0]["u"]["value"] == 4.5
    assert "msg" not in ups[1]["u"]          # null fields are absent
    assert all("_id" not in u["u"] for u in ups)
    assert all(not any(k.startswith("$") for k in u["u"]) for u in ups)
    # nothing dead-lettered
    assert not glob.glob(str(tmp_path / "mongo" / "**" / "*.jsonl"))


def test_mongo_sink_wire_failure_dead_letters(spark, tmp_path):
    """A Mongo reply with ok=0 raises in the transport; the tolerant
    shipper dead-letters the partition batch instead of failing."""
    from data_pipeline_kafka_ek_spark.streaming import mongo_wire as mw

    srv = _StubMongoServer(ok=0.0)
    try:
        df = spark.createDataFrame([(1, "x")], "event_id long, msg string")
        out = str(tmp_path / "mongo")
        sinks.mongo_sink(
            "col", "event_id", out, tolerant=True,
            transport=mw.MongoWireTransport("127.0.0.1", srv.port),
        )(df, 0)
    finally:
        srv.close()
    dlq = [
        json.loads(l)
        for f in glob.glob(f"{out}/col__dlq/*.jsonl")
        for l in open(f)
    ]
    assert len(dlq) == 1 and "transport" in dlq[0]["error"]


def test_bson_codec_roundtrip():
    """The BSON subset round-trips every type the sink documents carry."""
    from data_pipeline_kafka_ek_spark.streaming import mongo_wire as mw

    doc = {
        "s": "héllo",
        "i": 42,
        "f": 2.75,
        "b": True,
        "z": None,
        "ts": datetime.datetime(2024, 1, 2, 3, 4, 5, tzinfo=datetime.timezone.utc),
        "nested": {"k": "v", "n": 7},
        "arr": ["a", 1, 2.5],
    }
    assert mw.bson_decode_doc(mw.bson_encode_doc(doc)) == doc


def test_streaming_ann_assignment_equals_batch(spark, sf_dir):
    """Incremental IVF maintenance: vectors arriving over 4 micro-batches
    must land in exactly the cells the batch assignment computes (the
    operator is stateless, so streaming == batch by construction — this
    pins that no watermark/output-mode wiring breaks it)."""
    from data_pipeline_kafka_ek_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids_lloyd(emb, 8, 2)
    batch = {
        r.vec_id: (r.cell, r.cell_sim)
        for r in similarity.assign_cells(emb, cents).collect()
    }
    stream = runtime.replayed_stream(spark, emb, n_slices=4, order_col="vec_id")
    got = {
        r.vec_id: (r.cell, r.cell_sim)
        for r in runtime.run_available_now(
            similarity.assign_cells(stream, cents), output_mode="append"
        ).collect()
    }
    assert got == batch
    assert len({c for c, _ in got.values()}) > 1  # cells actually used


def test_streaming_kmv_state_is_bounded_and_order_invariant(spark):
    """The KMV automaton's defining properties: (a) the sketch never holds
    more than k hashes no matter how many distinct values stream through;
    (b) the final estimate is replay-order-invariant (mergeable sketch);
    (c) under-filled sketches count exactly."""
    import pyspark.sql.functions as SF

    k = 8
    rows = [(i, f"t{i % 3}", i % 200) for i in range(1000)]
    df = spark.createDataFrame(rows, "seq long, event_type string, user_id long")

    def final_counts(order_col):
        stream = runtime.replayed_stream(spark, df, n_slices=4, order_col=order_col)
        rev = runtime.run_available_now(
            runtime.kmv_distinct_stateful(stream, k=k), output_mode="update"
        )
        w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "grp"
        ).orderBy(SF.desc("rows_seen"))
        return {
            r.grp: (r.n_sketch, r.kmv_estimate, r.rows_seen)
            for r in rev.withColumn("__rn", SF.row_number().over(w))
            .filter(SF.col("__rn") == 1)
            .collect()
        }

    fwd = final_counts("seq")
    assert set(fwd) == {"t0", "t1", "t2"}
    for grp, (n_sketch, est, rows_seen) in fwd.items():
        assert n_sketch <= k          # state bounded by construction
        assert rows_seen in (333, 334)
        # ~67 distinct users per type with k=8: estimate within 4x is the
        # sanity band (k=8 is deliberately tiny; accuracy scales with k)
        assert 10 <= est <= 300, fwd
    # replay in a different order -> identical final sketches
    rev = final_counts("user_id")
    assert rev == fwd

    # under-filled sketch is exact: 3 distinct users only
    small = spark.createDataFrame(
        [(i, "a", i % 3) for i in range(50)], "seq long, event_type string, user_id long"
    )
    stream = runtime.replayed_stream(spark, small, n_slices=2, order_col="seq")
    out = runtime.run_available_now(
        runtime.kmv_distinct_stateful(stream, k=8), output_mode="update"
    )
    last = max(out.collect(), key=lambda r: r.rows_seen)
    assert (last.n_sketch, last.kmv_estimate) == (3, 3)


def test_stream_neardup_sorts_across_arrow_chunks(spark):
    """Regression: applyInPandasWithState hands a group's rows to the
    update function as MULTIPLE Arrow chunks. The bucket claimant must be
    the group-wide minimum id, not the minimum of whichever chunk arrived
    first — force tiny chunks and put the lowest id last in the batch."""
    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        text = "identical content for every document in this bucket"
        rows = [(i, text) for i in range(5, 17)] + [(0, text)]
        docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        stream = runtime.replayed_stream(spark, docs, n_slices=1)
        hits = runtime.run_available_now(
            runtime.stream_neardup_minhash(stream), output_mode="append"
        )
        per_doc = {
            r.doc_id: r.dup_of
            for r in hits.groupBy("doc_id")
            .agg(F.min("first_doc_id").alias("dup_of"))
            .collect()
        }
        assert 0 not in per_doc, per_doc      # global min is the claimant
        assert all(v == 0 for v in per_doc.values()), per_doc
        assert set(per_doc) == set(range(5, 17))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prior)


def test_drift_monitor_feeds_alert_sink(spark, sf_dir):
    """The monitoring loop end to end: PSI drift verdicts -> alert
    template -> the throttled alert consumer (the reference's K5/K6
    shape) — drifted groups produce exactly one formatted alert each."""
    from data_pipeline_kafka_ek_spark.operators.relational import distribution_drift

    base = spark.createDataFrame(
        [("stable", float(i % 10)) for i in range(50)]
        + [("moved", float(i % 10)) for i in range(50)],
        "event_type string, value double",
    )
    cur = spark.createDataFrame(
        [("stable", float(i % 10)) for i in range(50)]
        + [("moved", float(i % 10) + 40.0) for i in range(50)],
        "event_type string, value double",
    )
    alerts = (
        distribution_drift(base, cur)
        .filter(F.col("drifted"))
        .select(
            F.concat(
                F.lit("DRIFT "), F.col("grp"), F.lit(" psi="), F.col("psi")
            ).alias("alert_text")
        )
    )
    sent = []
    sinks.alert_sink(sent.append, throttle_rows=10)(alerts, 0)
    assert len(sent) == 1 and sent[0].startswith("DRIFT moved psi=")


def test_heavy_hitters_misra_gries_guarantees(spark):
    """The MG summary's classic guarantees over a real multi-batch replay,
    per group: (a) bounded state (<= k survivors); (b) every value whose
    true frequency exceeds N/(k+1) is reported; (c) every reported count
    is an UNDERestimate by at most its own error column, and that error
    is <= N/(k+1). Checked against exact batch counts."""
    import random

    rng = random.Random(42)
    k = 8
    rows = []
    # zipf-ish: values 0..3 hot, long tail of rare values
    for i in range(3000):
        grp = f"t{i % 2}"
        r = rng.random()
        if r < 0.55:
            v = rng.randint(0, 3)
        else:
            v = rng.randint(10, 400)
        rows.append((i, grp, v))
    df = spark.createDataFrame(rows, "seq long, event_type string, user_id long")

    stream = runtime.replayed_stream(spark, df, n_slices=5, order_col="seq")
    rev = runtime.run_available_now(
        runtime.heavy_hitters_stateful(stream, k=k), output_mode="update"
    )
    final = {}
    for r in rev.collect():
        cur = final.setdefault(r.grp, {"rows": -1, "items": {}})
        if r.rows_seen > cur["rows"]:
            cur["rows"] = r.rows_seen
            cur["items"] = {}
        if r.rows_seen == cur["rows"]:
            cur["items"][r.value] = (r.est_count, r.max_error)

    truth = {
        (r.event_type, str(r.user_id)): r.c
        for r in df.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_per_grp = {}
    for (g, _), c in truth.items():
        n_per_grp[g] = n_per_grp.get(g, 0) + c

    assert set(final) == {"t0", "t1"}
    for g, cur in final.items():
        n = n_per_grp[g]
        bound = n / (k + 1)
        assert cur["rows"] == n
        assert len(cur["items"]) <= k                      # (a) bounded state
        for v, c in truth.items():
            if v[0] == g and c > bound:
                assert v[1] in cur["items"], (v, c, bound)  # (b) no missed hitter
        for v, (cnt, err) in cur["items"].items():
            true_c = truth[(g, v)]
            assert cnt <= true_c <= cnt + err, (g, v)       # (c) one-sided error
            assert err <= bound + 1e-9


def test_heavy_hitters_underfilled_summary_is_exact(spark):
    """Fewer distinct values than k: the summary IS the exact count table
    (zero error), independent of replay slicing."""
    rows = [(i, "a", i % 3) for i in range(90)]
    df = spark.createDataFrame(rows, "seq long, event_type string, user_id long")
    stream = runtime.replayed_stream(spark, df, n_slices=3, order_col="seq")
    rev = runtime.run_available_now(
        runtime.heavy_hitters_stateful(stream, k=8), output_mode="update"
    )
    last = max(r.rows_seen for r in rev.collect())
    items = {
        r.value: (r.est_count, r.max_error)
        for r in rev.collect()
        if r.rows_seen == last
    }
    assert items == {"0": (30, 0), "1": (30, 0), "2": (30, 0)}


def test_heavy_hitters_batch_twin_reconciles_with_mg_stream(spark, sf_dir):
    """x_events_heavy_hitters (the exact batch twin, hash-oracle-checked)
    and the Misra-Gries automaton must agree where MG makes a promise:
    every batch row flagged mg_guaranteed (true frequency > N/(k+1),
    k=8) is present in the MG summary after a multi-batch replay of the
    same events, with est_count <= exact cnt <= est_count + max_error.
    This is the reconciliation the operator docs tell users to run."""
    import __spark_entry__ as em

    batch = {
        (r.grp, str(r.val)): r.cnt
        for r in em.queries()["x_events_heavy_hitters"](spark, sf_dir).collect()
        if r.mg_guaranteed
    }
    assert batch, "fixture must produce at least one MG-guaranteed value"

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").alias("seq"), "event_type", "user_id"
    )
    stream = runtime.replayed_stream(spark, events, n_slices=4, order_col="seq")
    rev = runtime.run_available_now(
        runtime.heavy_hitters_stateful(stream, k=8), output_mode="update"
    )
    final = {}
    for r in rev.collect():
        cur = final.setdefault(r.grp, {"rows": -1, "items": {}})
        if r.rows_seen > cur["rows"]:
            cur["rows"] = r.rows_seen
            cur["items"] = {}
        if r.rows_seen == cur["rows"]:
            cur["items"][r.value] = (r.est_count, r.max_error)
    for (grp, val), cnt in batch.items():
        assert val in final[grp]["items"], f"guaranteed {grp}/{val} missing from MG"
        est, err = final[grp]["items"][val]
        assert est <= cnt <= est + err, (grp, val, est, cnt, err)


def test_streaming_markov_equals_batch(spark, sf_dir):
    """The per-user last-event automaton over a 4-micro-batch replay
    must emit exactly the batch lead() transition multiset — including
    transitions that SPAN micro-batch boundaries (the state hand-off)."""
    import __spark_entry__ as em

    batch = {
        (r.from_type, r.to_type, r.n, r.p)
        for r in em.queries()["x_events_markov_transitions"](
            spark, sf_dir
        ).collect()
    }
    stream = {
        (r.from_type, r.to_type, r.n, r.p)
        for r in em.queries()["t_streaming_markov_transitions"](
            spark, sf_dir
        ).collect()
    }
    assert batch == stream and batch


def test_streaming_markov_null_event_types_match_batch_semantics(spark):
    """NULL event types: transitions INTO null are dropped, a null
    from_type survives — exactly the batch lead() rule, never the
    string 'None'."""
    import datetime as dt

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=i), i, t)
        for i, t in enumerate(["a", None, "b", "a"])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    stream = srt.replayed_stream(spark, df, n_slices=2, order_col="ts")
    out = srt.run_available_now(
        srt.markov_transitions_stateful(stream, watermark="365 days"),
        output_mode="append",
    )
    got = sorted(
        ((r.from_type, r.to_type) for r in out.collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1]),
    )
    # a->NULL dropped; NULL->b kept with from_type None; b->a kept
    assert got == [(None, "b"), ("b", "a")]


def test_markov_buffered_reorders_across_microbatch_boundaries(spark):
    """r13 verdict #6: events shuffled ACROSS micro-batch boundaries —
    but inside the watermark horizon — must still emit exactly the
    batch lead() transition multiset. The immediate automaton would
    chain them in arrival order and emit wrong transitions silently;
    the buffered automaton holds events until the watermark passes
    them, sorts the expired span, and only then chains. A late
    null-typed sentinel on an unused key drives the final watermark
    past the real data (it emits nothing: transitions into null are
    dropped)."""
    import datetime as dt

    from collections import Counter

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    base = dt.datetime(2024, 1, 1)
    # two users, interleaved; arrival_order deliberately disorders
    # events across the 4 replay slices (replay slices on arrival_order,
    # so event-time runs BACKWARD between some batches)
    events = [
        # (user, event_time_s, event_id, type, arrival_order)
        (1, 10, 1, "a", 0),
        (1, 20, 2, "b", 3),   # arrives 3 batches after its successor
        (1, 30, 3, "c", 1),
        (1, 40, 4, "a", 2),
        (2, 15, 5, "x", 2),
        (2, 25, 6, "y", 0),   # arrives before its predecessor
        (2, 35, 7, "x", 3),
        (2, 45, 8, "z", 1),
    ]
    rows = [
        (u, base + dt.timedelta(seconds=s), i, t, o)
        for u, s, i, t, o in events
    ]
    # sentinel: null type, unused key, far enough ahead that the final
    # watermark (= sentinel_ts - horizon) clears every real event
    rows.append(
        (99, base + dt.timedelta(seconds=400), 999, None, 4)
    )
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, "
        "arrival_order long",
    )
    stream = srt.replayed_stream(
        spark, df, n_slices=5, order_col="arrival_order"
    ).drop("arrival_order")
    out = srt.run_available_now(
        srt.markov_transitions_buffered(stream, watermark="100 seconds"),
        output_mode="append",
    )
    got = Counter((r.from_type, r.to_type) for r in out.collect())
    want = Counter(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "x"), ("x", "z")]
    )
    assert got == want
    # sanity: the same disorder through the IMMEDIATE automaton emits a
    # different (wrong) multiset — the buffer is doing real work
    out2 = srt.run_available_now(
        srt.markov_transitions_stateful(stream, watermark="100 seconds"),
        output_mode="append",
    )
    got2 = Counter((r.from_type, r.to_type) for r in out2.collect())
    assert got2 != want


def test_funnel_buffered_reorders_across_microbatch_boundaries(spark):
    """r13 verdict #6 follow-through: the funnel fold is order-SENSITIVE
    (step k must precede step k+1), so events delivered out of order
    across micro-batches make the immediate automaton miss real
    conversions. The buffered automaton holds events inside the
    watermark horizon and folds only the expired prefix in event-time
    order: per-user 'reached' must match the batch funnel fold. The
    same late null-typed sentinel trick drives the final watermark past
    the real data."""
    import datetime as dt

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    base = dt.datetime(2024, 1, 1)
    steps = ["view", "click", "purchase"]
    # user 1 completes all 3 steps IN EVENT TIME, but the middle step
    # arrives two replay batches late; user 2 performs click before
    # view in event time (no conversion past step 1) although arrival
    # order LOOKS like a clean view->click->purchase run
    events = [
        # (user, t_s, type, arrival)
        (1, 10, "view", 0),
        (1, 20, "click", 3),
        (1, 30, "purchase", 1),
        (2, 15, "click", 0),
        (2, 25, "view", 1),
        (2, 35, "purchase", 2),
    ]
    rows = [
        (u, base + dt.timedelta(seconds=s), i, t, o)
        for i, (u, s, t, o) in enumerate(events)
    ]
    rows.append((99, base + dt.timedelta(seconds=500), 999, None, 4))
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, "
        "arrival_order long",
    )
    stream = srt.replayed_stream(
        spark, df, n_slices=5, order_col="arrival_order"
    ).drop("arrival_order")
    out = srt.run_available_now(
        srt.funnel_stateful_buffered(
            stream, steps, watermark="200 seconds"
        ),
        output_mode="update",
    )
    reached = {}
    for r in out.collect():
        reached[r.user_id] = max(reached.get(r.user_id, 0), r.reached)
    assert reached[1] == 3          # late-arriving middle step recovered
    assert reached[2] == 1          # event-time order respected: view
    # only reaches step 1 (click precedes it in event time)
    # the immediate automaton on the same disordered feed gets user 1
    # wrong — the buffer is doing real work
    out2 = srt.run_available_now(
        srt.funnel_stateful(stream, steps, watermark="200 seconds"),
        output_mode="update",
    )
    reached2 = {}
    for r in out2.collect():
        reached2[r.user_id] = max(reached2.get(r.user_id, 0), r.reached)
    assert reached2[1] < 3


def test_disordered_replay_defeats_immediate_but_not_buffered(spark):
    """The catalog's adversarial replay harness
    (runtime.disordered_replayed_stream — swaps adjacent event-time
    ranges, so whole ranges arrive a batch after strictly later ones)
    is what the r15 driver-attested buffered twins ride. Pin both
    halves of its contract here: the buffered Markov automaton over the
    disordered feed reproduces the exact batch transition multiset
    (nothing watermark-dropped, everything re-sorted), while the
    IMMEDIATE automaton over the very same feed emits a different —
    wrong — multiset, proving the replay really delivers cross-batch
    disorder and the oracle hash can only match because of the
    buffer."""
    import datetime as dt
    from collections import Counter

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    base = dt.datetime(2024, 1, 1)
    # 32 events over 800s = 4 per swap range; the type ENCODES the
    # range (s0..s7), so any cross-range arrival inversion fabricates a
    # backward transition (e.g. s1->s0) the in-order truth cannot contain
    rows = [
        (
            1 + (eid % 2),
            base + dt.timedelta(seconds=25 * eid),
            eid,
            f"s{(25 * eid) // 100}",
        )
        for eid in range(32)
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    df = spark.createDataFrame(rows, schema)
    sentinel = spark.createDataFrame([(99, base, 999, None)], schema)
    stream, wm = srt.disordered_replayed_stream(spark, df, sentinel)

    # batch truth, folded in plain Python
    want = Counter()
    for u in (1, 2):
        seq = [t for (uu, _, _, t) in rows if uu == u]
        want.update(zip(seq[:-1], seq[1:]))

    out = srt.run_available_now(
        srt.markov_transitions_buffered(stream, watermark=wm),
        output_mode="append",
    )
    got = Counter((r.from_type, r.to_type) for r in out.collect())
    assert got == want
    out2 = srt.run_available_now(
        srt.markov_transitions_stateful(stream, watermark=wm),
        output_mode="append",
    )
    got2 = Counter((r.from_type, r.to_type) for r in out2.collect())
    assert got2 != want


def test_markov_buffered_orders_submillisecond_events(spark):
    """Review finding (r15): the reorder buffer must sort at the ts
    column's REAL precision. events.ts is microsecond TimestampType, so
    two same-user events 400µs apart inside one millisecond exist; a
    ms-truncated buffer would tie them and fall back to event_id, while
    the batch lead() oracle orders by the full timestamp — a latent
    hash divergence. Construct exactly that: µs order OPPOSES event_id
    order within one ms; the buffered automaton must emit the µs-order
    transition."""
    import datetime as dt

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # id order (3 < 9) opposes µs order (100µs < 500µs)
        (1, base + dt.timedelta(seconds=1, microseconds=100), 9, "a"),
        (1, base + dt.timedelta(seconds=1, microseconds=500), 3, "b"),
        (99, base + dt.timedelta(seconds=500), 999, None),
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    df = spark.createDataFrame(rows, schema)
    stream = srt.replayed_stream(spark, df, n_slices=2, order_col="event_id")
    out = srt.run_available_now(
        srt.markov_transitions_buffered(stream, watermark="100 seconds"),
        output_mode="append",
    )
    got = [(r.from_type, r.to_type) for r in out.collect()]
    assert got == [("a", "b")], got


def test_funnel_buffered_reached_is_monotone_under_late_data(spark):
    """Property-pin for the buffered automata's emission contract (r14
    verdict 'what's wrong #3'): the catalog selects a user's final
    funnel state as max(reached) over update-mode revisions, which is
    sound ONLY if reached is monotone per key across micro-batches —
    an invariant that previously lived in a docstring. Drive randomized
    event sets (types, event times, adversarial arrival permutations —
    late but inside the watermark) through funnel_stateful_buffered,
    capture every revision in batch order via foreachBatch, and assert
    (a) reached never decreases for any key, (b) the final revision
    equals the in-event-time-order batch fold."""
    import datetime as dt
    import random
    import tempfile as tmpmod

    from data_pipeline_kafka_ek_spark.streaming import runtime as srt

    steps = ["view", "click", "purchase"]
    base = dt.datetime(2024, 1, 1)

    def batch_fold(times_types):
        reached, t0, tp = 0, None, None
        for t, y in sorted(times_types, key=lambda e: (e[0], e[1] or "")):
            if reached < len(steps) and y == steps[reached] and (
                reached == 0 or (t > tp and t <= t0 + 7 * 86400)
            ):
                if reached == 0:
                    t0 = t
                tp = t
                reached += 1
        return reached

    rng = random.Random(1509)
    for trial in range(6):
        n_users = rng.randint(1, 4)
        rows, truth = [], {}
        eid = 0
        for u in range(1, n_users + 1):
            n_ev = rng.randint(1, 10)
            evs = []
            for _ in range(n_ev):
                t_s = rng.randint(0, 900)
                y = rng.choice(steps + ["noise", "noise2"])
                evs.append((t_s, y))
                rows.append(
                    (u, base + dt.timedelta(seconds=t_s), eid, y)
                )
                eid += 1
            truth[u] = batch_fold(evs)
        arrival = list(range(len(rows)))
        rng.shuffle(arrival)  # adversarial: arbitrary arrival order
        schema = (
            "user_id long, ts timestamp, event_id long, "
            "event_type string, arrival long"
        )
        df = spark.createDataFrame(
            [r + (a,) for r, a in zip(rows, arrival)], schema
        )
        sentinel = spark.createDataFrame(
            [(999, base + dt.timedelta(seconds=99999), 10**6, None,
              len(rows))],
            schema,
        )
        stream = srt.replayed_stream(
            spark, df.unionByName(sentinel), n_slices=4,
            order_col="arrival",
        ).drop("arrival")
        # watermark covers the whole span: every event is late-but-
        # inside-watermark, the hardest legal disorder
        revs = []

        def sink(batch_df, batch_id):
            revs.extend(
                (batch_id, r.user_id, r.reached)
                for r in batch_df.collect()
            )

        ckpt = tmpmod.mkdtemp(prefix="ckpt_monotone_")
        q = (
            srt.funnel_stateful_buffered(
                stream, steps, watermark="2000 seconds"
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        seen = {}
        for _, u, reached in sorted(revs, key=lambda r: r[0]):
            assert reached >= seen.get(u, 0), (
                f"trial {trial}: reached regressed for user {u}: {revs}"
            )
            seen[u] = reached
        for u, want in truth.items():
            assert seen.get(u, 0) == want, (
                f"trial {trial}: user {u} final {seen.get(u)} != {want}"
            )
