"""Structured Streaming runtime (SURVEY.md §2.10, §7.2 phase 3).

The reference's execution model is ksqlDB persistent queries: continuous
SQL over Kafka topics with incrementally-maintained tables (`EMIT CHANGES`,
reference: README.md:110-116). Spark twin: the SAME DataFrame transforms
from plans/ and operators/ wrapped in Structured Streaming —

* source: file stream over the fixture parquet (batch/stream duality —
  the Kafka source in sources/kafka.py has the same contract);
* `EMIT CHANGES` -> ``outputMode("update")`` for aggregates, ``append``
  for stateless derivations (T1);
* tumbling/hopping/session windows -> ``window`` / ``session_window``
  (T2-T4);
* late data -> explicit ``withWatermark`` (T5 — ksqlDB keeps windows open
  for the whole retention period; we default to a generous watermark and
  make it a knob; exact parity would be unbounded state). Spark >=3.4
  splits the two watermark roles: late-event FILTERING uses the previous
  micro-batch's watermark, state EVICTION the current one, so a late row
  is only dropped starting one batch after the watermark passed its
  window (pinned by tests/test_streaming.py::
  test_windowed_counts_late_data_policy);
* re-key (`PARTITION BY`, T6) -> sink key column / ``repartition``;
* reprocess-from-earliest (T8) -> fresh checkpoint + full re-read;
* throttled consumption (T9) -> ``trigger(processingTime=...)``.

For deterministic tests everything runs with ``trigger(availableNow=True)``
into a memory sink and is compared against the batch twin — the
batch ≡ streaming property (SURVEY.md §5.2 layer 2).
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.sources.tables import load_table, normalize_events_ts

DEFAULT_WATERMARK = "24 hours"  # generous, ksqlDB-retention-like (T5)


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a fixture table as a STREAM (S1's batch/stream duality): file
    source with the batch schema. The same downstream transforms run
    unchanged — this is the engine's stream/table unification."""
    batch = load_table(spark, sf_dir, name)
    reader = spark.readStream.schema(batch.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if name == "events":
        # the streaming reader sees the raw ts column (long ns on Spark 3.x,
        # TIMESTAMP_NTZ on 4.x; the batch path's schema already has the
        # conversion applied, so take the schema from the raw file instead),
        # then re-apply the same version-aware conversion
        raw_schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        df = (
            reader.schema(raw_schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
        return normalize_events_ts(df)
    return reader.option("pathGlobFilter", f"{name}.parquet").parquet(sf_dir)


def replayed_stream(
    spark: SparkSession,
    df: DataFrame,
    n_slices: int = 4,
    order_col: str | None = None,
    slice_col: str | None = None,
) -> DataFrame:
    """Re-feed a batch DataFrame as a multi-micro-batch stream: write it as
    ``n_slices`` files and stream them one file per trigger. Used by the
    batch ≡ streaming regression tests to force real incremental state
    updates (a single-batch stream would trivially equal batch).

    The file source processes files oldest-modification-time first, but a
    parallel write commits part files in task-completion order — so with
    ``order_col`` the slices are renamed into a fresh directory with
    strictly increasing mtimes, guaranteeing replay follows the range
    order. Without that, a later range landing first would advance the
    watermark past the remaining slices and silently drop them as late.

    ``slice_col`` (mutually exclusive with ``order_col``) names an INT
    column holding the exact slice index in ``[0, n_slices)`` — the
    DETERMINISTIC grouping mode. ``repartitionByRange`` only guarantees
    non-splitting and ordering of the range key; its sampled,
    row-weight-balanced boundaries may merge two intended slices into
    one partition on skewed slice sizes (1+3 instead of 2+2), so
    callers whose contract is an EXACT batching (the ACID
    ``commits_per_batch`` replay) derive the slice index themselves and
    pass it here. One job: hash-repartition on the slice key (a key
    lives entirely in one partition), then ``partitionBy`` the write —
    exactly one file per non-empty slice, renamed into mtime order and
    consumed by the column-less schema (``partitionBy`` strips the
    key from file contents). An empty slice writes nothing and is
    skipped — fewer micro-batches, never a merged or split one."""
    import glob as _glob
    import os as _os

    stage = tempfile.mkdtemp(prefix="replay_stage_")
    tmp = tempfile.mkdtemp(prefix="replay_")
    base = _os.stat(stage).st_mtime
    import shutil as _shutil

    if slice_col is not None:
        if order_col is not None:
            raise ValueError("order_col and slice_col are exclusive")
        out_schema = df.drop(slice_col).schema
        (
            df.repartition(max(1, n_slices), F.col(slice_col))
            .write.mode("overwrite")
            .partitionBy(slice_col)
            .parquet(stage)
        )
        for i in range(n_slices):
            parts = sorted(_glob.glob(f"{stage}/{slice_col}={i}/part-*"))
            if not parts:
                continue  # empty slice: no micro-batch
            if len(parts) != 1:
                raise AssertionError(
                    f"slice {i} wrote {len(parts)} files — the slice "
                    "key must be hash-colocated before partitionBy"
                )
            dst = f"{tmp}/slice_{i:05d}.parquet"
            _os.rename(parts[0], dst)
            _os.utime(dst, (base + i, base + i))
        # rows whose slice value fell outside [0, n_slices) would be
        # SILENTLY dropped from the replay (the loop above never visits
        # their directory) — fail loudly instead: a replica converging
        # to a state missing rows is the worst possible failure mode
        leftovers = [
            d
            for d in _glob.glob(f"{stage}/{slice_col}=*")
            if _glob.glob(f"{d}/part-*")
        ]
        if leftovers:
            raise ValueError(
                f"slice values outside [0, {n_slices}): "
                f"{sorted(d.rsplit('/', 1)[-1] for d in leftovers)} — "
                "n_slices and the slice column must come from the same "
                "snapshot"
            )
        _shutil.rmtree(stage, ignore_errors=True)
        return (
            spark.readStream.schema(out_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )

    out = df
    if order_col is not None:
        out = df.repartitionByRange(n_slices, F.col(order_col))
    else:
        out = df.repartition(n_slices)
    out.write.mode("overwrite").parquet(stage)
    for i, part in enumerate(sorted(_glob.glob(f"{stage}/part-*"))):
        dst = f"{tmp}/slice_{i:05d}.parquet"
        _os.rename(part, dst)
        _os.utime(dst, (base + i, base + i))
    # the staging dir now holds only _SUCCESS/.crc droppings — remove it
    _shutil.rmtree(stage, ignore_errors=True)
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )


def commit_span_stream(
    spark: SparkSession,
    feed: DataFrame,
    versions: "list[int]",
    commits_per_batch: int = 1,
    version_col: str = "_commit_version",
) -> DataFrame:
    """The shared commit-span batching idiom (one definition, consumed by
    ``TxnLogTable.stream_changes`` and ``TableReplicator
    .replicate_stream``): replay ``feed`` with one micro-batch per
    ``commits_per_batch`` ADJACENT commit versions, sliced
    DETERMINISTICALLY on ``(version - min(versions)) // k`` so a commit
    never splits across batches, grouping is the exact ceil(n/k) the
    contract states on contiguous version logs, and a re-run batches
    identically (``repartitionByRange``'s sampled boundaries promise
    neither). ``/`` + ``cast("int")`` is floor division here: versions
    are >= the minimum, so truncation toward zero IS floor. An empty
    ``versions`` list degrades to a single-slice ordered replay of the
    (typed, empty) feed."""
    if not versions:
        return replayed_stream(spark, feed, n_slices=1, order_col=version_col)
    k = max(1, commits_per_batch)
    vmin = min(versions)
    n_slices = (max(versions) - vmin) // k + 1
    sliced = feed.withColumn(
        "__slice",
        ((F.col(version_col) - F.lit(vmin)) / F.lit(k)).cast("int"),
    )
    return replayed_stream(
        spark, sliced, n_slices=n_slices, slice_col="__slice"
    )


def disordered_replayed_stream(
    spark: SparkSession,
    df: DataFrame,
    sentinel: DataFrame,
    ts_col: str = "ts",
    n_pairs: int = 4,
) -> "tuple[DataFrame, str]":
    """Replay ``df`` as ``2 * n_pairs + 1`` micro-batches whose ARRIVAL
    order swaps adjacent event-time ranges (ranges 1,0,3,2,5,4,...): a
    whole range of events arrives one batch AFTER a strictly later
    range, so every batch boundary delivers out-of-order data — the
    adversarial feed the reorder-buffered automata
    (:func:`markov_transitions_buffered`,
    :func:`funnel_stateful_buffered`) exist for, and on which the
    immediate automata emit wrong results. Returns ``(stream,
    watermark_str)``; the watermark is sized to 3 range widths — wide
    enough that no real event is ever watermark-late under the swap
    (an early batch's max ts leads the following late range by at most
    2 widths), narrow enough that expiry happens INCREMENTALLY across
    the replay instead of one final flush, so the buffer's
    hold-sort-drain cycle runs on every batch boundary.

    ``sentinel`` is a one-row frame with ``df``'s schema whose ``ts`` is
    OVERWRITTEN to past ``max(ts) + watermark`` and delivered as the
    final micro-batch: it drives the closing watermark past all real
    data so the provisional tail drains (callers give it a key and
    payload that fold to nothing — a null event type, an unused key).
    Slicing uses :func:`replayed_stream`'s deterministic ``slice_col``
    mode, so the batch composition is exact on every run — this
    function feeds oracle-checked catalog queries whose hashes must be
    reproducible."""
    b = df.agg(
        F.min(F.col(ts_col).cast("double")).alias("lo"),
        F.max(F.col(ts_col).cast("double")).alias("hi"),
    ).first()
    if b["lo"] is None:
        raise ValueError(
            "disordered_replayed_stream needs at least one non-null "
            f"{ts_col!r} row to size its ranges and watermark — got an "
            "empty frame (replay it with replayed_stream instead)"
        )
    lo, hi = float(b["lo"]), float(b["hi"])
    n_slices = 2 * n_pairs
    width = max(1.0, (hi - lo) / n_slices) + 1e-3
    wm_s = int(3.0 * width) + 2
    rng = F.least(
        F.floor(
            (F.col(ts_col).cast("double") - F.lit(lo)) / F.lit(width)
        ).cast("int"),
        F.lit(n_slices - 1),
    )
    data = df.withColumn("__slice", rng.bitwiseXOR(F.lit(1)))
    sen = sentinel.withColumn(
        ts_col, F.timestamp_seconds(F.lit(hi + 2.0 * wm_s + 1.0))
    ).withColumn("__slice", F.lit(n_slices))
    stream = replayed_stream(
        spark,
        data.unionByName(sen),
        n_slices=n_slices + 1,
        slice_col="__slice",
    )
    return stream, f"{wm_s} seconds"


HDFS_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "update",
    query_name: str | None = None,
    small_state: bool = False,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over all available input
    (``trigger(availableNow=True)``) into a memory sink; return the final
    result as a batch DataFrame.

    This is the reference's reprocess-from-earliest pattern (T8,
    ``SET 'auto.offset.reset'='earliest'`` before each CSAS) — fresh
    checkpoint, full replay, deterministic final state.

    ``small_state``: the session default is RocksDB (survives keyed state
    larger than executor memory — session windows, dedup buffers,
    unbounded automata). A stateful operator whose per-key state is
    FIXED-WIDTH and small (running_counts_stateful: two numbers per key)
    never approaches that regime until keys ~ executor memory, and
    RocksDB's per-partition instance open/compaction is pure fixed cost
    there — measured 2.3 s of a 5.9 s replay on the bench box. Passing
    ``small_state=True`` runs THIS query on the memory-backed
    HDFSBackedStateStoreProvider (Spark's default provider: heap map +
    checkpoint files) and restores the session conf after. The provider
    choice cannot change results — only where state lives between
    micro-batches. Override with SPARK_GRAFT_FORCE_ROCKSDB=1 to pin
    RocksDB everywhere (e.g. a cluster profiling run).
    """
    import os as _os

    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    spark_ = stream_df.sparkSession
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark_.conf.get(conf_key, None)
    flip = small_state and _os.environ.get("SPARK_GRAFT_FORCE_ROCKSDB") != "1"
    if flip:
        spark_.conf.set(conf_key, HDFS_STATE_STORE)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # the provider class is captured into the query's state config at
        # start — restore the session conf immediately so concurrently
        # started queries keep the session default
        if flip:
            if prior is None:
                spark_.conf.unset(conf_key)
            else:
                spark_.conf.set(conf_key, prior)
    q.awaitTermination()
    # the query is terminated and the memory sink holds the result rows
    # in memory — the per-query checkpoint dir (offsets/commits/state
    # files) is dead weight; sweeping it keeps long sessions (bench
    # min-of-3, the 190-query gate) from accumulating thousands of small
    # scratch files
    import shutil as _shutil

    _shutil.rmtree(ckpt, ignore_errors=True)
    spark = stream_df.sparkSession
    result = spark.table(name)
    if output_mode == "update":
        # memory sink in update mode appends every state revision; the
        # final table state is the latest row per key — callers that need
        # exact final state should aggregate with keys; for windowed aggs
        # we re-derive latest per (window, key) downstream.
        return result
    return result


def windowed_counts(
    events: DataFrame,
    window_duration: str = "15 minutes",
    slide: str | None = None,
    key: str = "event_type",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """The reference's windowed CTAS (A3/A4/T2/T3): tumbling (or hopping,
    when ``slide`` is given) count per key with an explicit watermark."""
    win = (
        F.window("ts", window_duration)
        if slide is None
        else F.window("ts", window_duration, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col(key),
            F.col("event_count"),
        )
    )


def session_windowed_counts(
    events: DataFrame,
    gap: str = "5 minutes",
    key: str = "user_id",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Session windows (T4 — documented option in the reference,
    README.md:325): per-key sessions closed after ``gap`` of inactivity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.col(key),
            F.col("event_count"),
        )
    )


def asof_join_per_batch(
    stream_df: DataFrame,
    right_for_batch: Callable[[int], DataFrame],
    sink: Callable[[DataFrame, int], None],
    key: str,
    **asof_kwargs,
):
    """Streaming as-of join with the reference's stream-table semantics:
    each micro-batch joins against the right side's CURRENT state at
    processing time (reference README.md:204-210 — an upstream UPDATE
    changes what *subsequent* events see; earlier events keep the state
    they were processed against, even if a lower-event-time right row
    arrives later).

    ``right_for_batch(batch_id)`` returns the right-side table as of that
    batch (a MaterializedTable read, a snapshot-isolated dim table, ...);
    each batch's as-of result goes to ``sink(result_df, batch_id)``. This
    is ``foreachBatch``, so the per-batch join is ordinary batch
    ``temporal.asof_join`` — one key shuffle + sort per micro-batch, the
    same scale shape as the batch operator; right-side state is bounded
    by whatever retention ``right_for_batch`` applies.

    Returns the started streaming query (caller awaits termination).
    """
    from data_pipeline_kafka_ek_spark.operators.temporal import asof_join

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(asof_join(batch_df, right_for_batch(batch_id), key=key, **asof_kwargs), batch_id)

    ckpt = tempfile.mkdtemp(prefix="ckpt_asof_")
    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def rekey_for_sink(df: DataFrame, key_col: str) -> DataFrame:
    """`PARTITION BY FULL_NAME` twin (T6, reference:
    ksqldb-statements.sql:68): choose the output message key. For a Kafka
    sink this sets the ``key`` column (the broker then partitions by it);
    intra-Spark it is a hash repartition on the key."""
    return df.withColumn("key", F.col(key_col).cast("string")).repartition(F.col("key"))


def rate_events(
    spark: SparkSession, rows_per_second: int = 2, user_cardinality: int = 15
) -> DataFrame:
    """Datagen twin (S4, reference: docker-compose.yml:140-148 — one
    synthetic ratings event per <=750 ms): the built-in rate source with
    deterministic column synthesis from the sequence value."""
    r = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return r.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % user_cardinality).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("signup"), F.lit("error")),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * 37, F.lit(1000)) / 10.0).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).alias("k"))).alias("props"),
    )


def parse_json_tolerant(
    df: DataFrame, json_col: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Malformed-document tolerance (T10/K2, reference:
    ksqldb-statements.sql:74-77 — ``behavior.on.malformed.documents=warn``,
    ``errors.tolerance=all`` + error logging): PERMISSIVE parse; bad rows go
    to a dead-letter DataFrame instead of failing the pipeline.

    Returns ``(good, dead_letter)``.
    """
    # PERMISSIVE mode routes unparseable input into _corrupt_record instead
    # of failing the job (from_json alone would yield a null-fielded struct,
    # indistinguishable from legitimately-null fields)
    full_schema = f"{schema}, _corrupt_record string"
    parsed = df.withColumn(
        "__parsed",
        F.from_json(
            F.col(json_col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    # NULL payloads (Kafka tombstones) and inputs from_json maps to a NULL
    # struct never populate _corrupt_record, so they must be rejected
    # explicitly or they'd enter the good stream as all-NULL rows — the
    # exact ambiguity PERMISSIVE mode exists to avoid. Every conjunct is
    # null-safe (isNull/isNotNull), so `ok` is never three-valued-NULL and
    # good/dlq form an exact partition of the input.
    ok = (
        F.col(json_col).isNotNull()
        & F.col("__parsed").isNotNull()
        & F.col("__parsed._corrupt_record").isNull()
    )
    good = (
        parsed.filter(ok)
        .select("*", F.col("__parsed.*"))
        .drop("__parsed", "_corrupt_record")
    )
    dlq = parsed.filter(~ok).drop("__parsed")
    return good, dlq


def stream_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key across
    micro-batches (the LLM-pipeline streaming twin of
    operators/dedup.py::exact_dedup).

    Built on ``dropDuplicatesWithinWatermark`` so the dedup state is
    *bounded*: a key's fingerprint is held only until the watermark passes
    its event time, then evicted — at 100 TB/day the state store holds one
    slim row per key per watermark horizon instead of forever (plain
    ``dropDuplicates`` on a stream would grow without bound). RocksDB
    state (session.py) keeps it off-heap.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "6 hours",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream–stream INNER equi-join with an event-time interval: each left
    event matches right events for the same key within ``[l.ts - lookback,
    l.ts]``. Beyond the reference (ksqlDB's demo joins stream-to-TABLE only,
    ksqldb-statements.sql:50-60); this is the fully-streaming shape — e.g.
    purchases joined to the clicks that preceded them.

    Scale contract: BOTH sides carry a watermark and the join condition
    bounds event-time distance, so Spark's stream-stream join can evict
    buffered rows once the watermark passes ``ts + lookback`` — state per
    key is the lookback horizon, not the stream history. Without the time
    bound (or with only one watermark) the state store grows forever;
    Spark would accept the query and die at scale, so this helper makes
    the bound mandatory.

    Columns come back under ``l.*`` / ``r.*`` aliases for the caller to
    project.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}"))
    )
    return l.join(r, cond, "inner")


def running_counts_stateful(
    stream_df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a per-key
    running event counter with value total — the escape hatch shown for
    operators Spark's built-in aggregates can't express (arbitrary Python
    state transitions, e.g. CUSUM alerting, pattern automata).

    State per key is two numbers; each micro-batch updates the state from
    its Arrow batches and emits one row per touched key (update-mode
    semantics, like the reference's EMIT CHANGES aggregates).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key} long, event_count long, value_total double"
    state_schema = "count long, total double"

    def update(key_tuple, pdfs, state):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        import pandas as pd

        yield pd.DataFrame(
            {key: [key_tuple[0]], "event_count": [count], "value_total": [total]}
        )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_stateful(
    stream_df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_s: int = 7 * 86400,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming twin of ``relational.funnel``: a per-user pattern
    automaton over the live event stream. State per key is exactly the
    batch fold's accumulator — ``(reached, t0, tp)``, three numbers — and
    each micro-batch advances it through that batch's events in event-time
    order, emitting the user's current funnel level (update mode, like
    the reference's EMIT CHANGES). ``reached`` is monotone, so the final
    revision per user is selected by max.

    The automaton is inherently sequential per user, so this is the
    documented per-row-in-Python escape hatch (same tier as CUSUM
    alerting); per-user event counts are small and batches arrive
    Arrow-vectorized. Ordering contract: in-order arrival across
    micro-batches (the replay harness guarantees it); a production feed
    delivering late events across batch boundaries needs
    :func:`funnel_stateful_buffered`, which enforces the contract with
    a watermark-bounded reorder buffer. Timestamps are held as int64 ns
    so state rows stay fixed-width.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps_list = list(steps)
    n = len(steps_list)
    within_ns = int(within_s) * 1_000_000_000
    out_schema = f"{user_col} long, reached integer"
    state_schema = "reached integer, t0 long, tp long"

    def update(key_tuple, pdfs, state):
        import pandas as pd

        reached, t0, tp = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, type_col])
            ts_ns = pdf[ts_col].values.astype("datetime64[ns]").astype("int64")
            for t, y in zip(ts_ns, pdf[type_col].values):
                if (
                    reached < n
                    and y == steps_list[reached]
                    and (reached == 0 or (t > tp and t <= t0 + within_ns))
                ):
                    if reached == 0:
                        t0 = int(t)
                    tp = int(t)
                    reached += 1
        state.update((reached, int(t0), int(tp)))
        yield pd.DataFrame({user_col: [key_tuple[0]], "reached": [reached]})

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_stateful_buffered(
    stream_df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_s: int = 7 * 86400,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """:func:`funnel_stateful` with the watermark-bounded REORDER BUFFER
    (the :func:`markov_transitions_buffered` pattern — see there for the
    full ordering argument). The funnel fold is order-SENSITIVE (step k
    must precede step k+1 in event time), so out-of-order arrival across
    micro-batches would silently miss or fake conversions in the
    immediate automaton; here events hold in per-key state inside the
    watermark horizon and only the strictly-expired prefix — which no
    future input can precede — folds through the step machine, in event-
    time order. State per key = the batch fold's three numbers plus the
    horizon's buffered events; an EventTimeTimeout pinned to the
    earliest pending event keeps quiet keys draining. Emissions are
    update-mode revisions of the key's current ``reached`` (monotone, so
    max per user is the final answer — same selection rule as the
    immediate twin). All other stateful automata in this module fold
    order-INVARIANTLY (counts, sketches, counters) or ride Spark's
    native session windows, so the funnel and the Markov chain are the
    two that need the buffer."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps_list = list(steps)
    n = len(steps_list)
    within_ns = int(within_s) * 1_000_000_000
    out_schema = f"{user_col} long, reached integer"
    state_schema = (
        "reached integer, t0 long, tp long, "
        "buf_ts array<long>, buf_type array<string>"
    )

    def update(key_tuple, pdfs, state):
        import pandas as pd

        if state.exists:
            reached, t0, tp, bts, btyp = state.get
            buf = list(zip(bts, btyp))
        else:
            reached, t0, tp, buf = 0, 0, 0, []
        frames = [f for f in pdfs if len(f)]
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            ts_ns = (
                pd.to_datetime(pdf[ts_col])
                .values.astype("datetime64[ns]")
                .astype("int64")
            )
            for t, y in zip(ts_ns, pdf[type_col].values):
                buf.append((int(t), None if pd.isna(y) else str(y)))
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        # strict-below expiry; (ts, type) is the immediate twin's (and
        # the batch fold's) total order, None types last per timestamp
        expired = sorted(
            (e for e in buf if e[0] < wm_ns),
            key=lambda e: (e[0], e[1] is None, e[1] or ""),
        )
        pending = [e for e in buf if e[0] >= wm_ns]
        for t, y in expired:
            if (
                reached < n
                and y == steps_list[reached]
                and (reached == 0 or (t > tp and t <= t0 + within_ns))
            ):
                if reached == 0:
                    t0 = t
                tp = t
                reached += 1
        state.update(
            (
                reached,
                int(t0),
                int(tp),
                [e[0] for e in pending],
                [e[1] for e in pending],
            )
        )
        if pending:
            state.setTimeoutTimestamp(
                min(e[0] for e in pending) // 1_000_000 + 1
            )
        yield pd.DataFrame({user_col: [key_tuple[0]], "reached": [reached]})

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def markov_transitions_stateful(
    stream_df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming twin of the batch Markov transition profile
    (plans/extensions.py::x_events_markov_transitions): a per-key
    last-event automaton that emits one ``(from_type, to_type)`` row per
    OBSERVED transition, append-mode — the downstream transition-matrix
    rollup is a plain streaming-safe groupBy count over its output.

    State per key is ONE value (the key's most recent event type); each
    micro-batch sorts its rows in event-time order (``ts`` then
    ``id_col`` — the same total order the batch lead() uses), chains
    them onto the stored last event, emits the consecutive pairs, and
    stores the new tail. Ordering contract: in-order arrival across
    micro-batches (the replay harness slices on the globally-unique
    event time). A production Kafka feed delivering late events across
    batch boundaries needs :func:`markov_transitions_buffered`, which
    enforces that contract with a watermark-bounded reorder buffer
    instead of trusting it. Append output keeps the emission monotone —
    a transition, once observed, is a fact.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "from_type string, to_type string"
    state_schema = "last_type string"

    def update(key_tuple, pdfs, state):
        import pandas as pd

        frames = list(pdfs)
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values([ts_col, id_col])
        # NULL event types stay None (never the string 'None'): the
        # batch lead() oracle keeps a null as a from_type and drops
        # transitions INTO null — mirror both rules exactly
        types = [
            None if pd.isna(t) else str(t)
            for t in pdf[type_col].values
        ]
        prev_exists = state.exists
        prev = state.get[0] if prev_exists else None
        seq = ([prev] if prev_exists else []) + types
        if types:
            state.update((types[-1],))
        pairs = [
            (a, b) for a, b in zip(seq[:-1], seq[1:]) if b is not None
        ]
        if pairs:
            yield pd.DataFrame(
                {
                    "from_type": [a for a, _ in pairs],
                    "to_type": [b for _, b in pairs],
                }
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def markov_transitions_buffered(
    stream_df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """:func:`markov_transitions_stateful` with a BOUNDED REORDER BUFFER
    — the production-ordering-safe form (r13 verdict #6). The immediate
    automaton trusts in-order arrival across micro-batches; a real Kafka
    source delivers late events across batch boundaries, and a one-value
    state would then emit wrong transitions silently. Here events are
    held in per-key state while they are still inside the watermark
    horizon (a later batch may legally deliver an earlier event), and
    only events STRICTLY BELOW the current watermark — which Spark
    guarantees no future input can precede — are sorted, chained onto
    the stored last event, and emitted. The horizon bounds the buffer:
    state per key is one (type, has_last) pair plus the key's events of
    the last ``watermark`` window, exactly the reorder slack the
    deployment declares.

    An ``EventTimeTimeout`` set to the earliest pending event keeps keys
    draining even when they receive no new rows: the timeout fires once
    the watermark passes that event, and the expiry pass re-runs on the
    buffered state alone. The tail inside the final horizon stays
    provisionally buffered — correct streaming semantics (those events
    may still be reordered); tests drive the watermark past it with a
    late null-typed sentinel, which emits nothing (transitions into
    null are dropped, matching the batch lead() oracle's rule).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "from_type string, to_type string"
    state_schema = (
        "last_type string, has_last boolean, "
        "buf_ts array<bigint>, buf_id array<bigint>, buf_type array<string>"
    )

    def update(key_tuple, pdfs, state):
        import pandas as pd

        if state.exists:
            last_type, has_last, buf_ts, buf_id, buf_type = state.get
            buf = list(zip(buf_ts, buf_id, buf_type))
        else:
            last_type, has_last, buf = None, False, []
        frames = [f for f in pdfs if len(f)]
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            # unit-safe MICROSECOND epoch (casting through datetime64[us]
            # works for ns- and us-backed pandas datetime columns alike):
            # the buffer must sort at the column's real precision — a ms
            # truncation would tie sub-ms-distinct events and fall back
            # to event_id where the batch lead() oracle orders by the
            # full timestamp first, a latent hash divergence on any
            # fixture with opposing (ts, id) order inside one millisecond
            ts_us = (
                pd.to_datetime(pdf[ts_col])
                .values.astype("datetime64[us]")
                .astype("int64")
            )
            for t_us, i, ty in zip(
                ts_us, pdf[id_col].values, pdf[type_col].values
            ):
                buf.append(
                    (int(t_us), int(i), None if pd.isna(ty) else str(ty))
                )
        wm_us = state.getCurrentWatermarkMs() * 1000
        # strictly-below: Spark's late-event filter only guarantees no
        # FUTURE row with ts < watermark, so ts == watermark must wait
        expired = sorted(
            [e for e in buf if e[0] < wm_us], key=lambda e: (e[0], e[1])
        )
        pending = [e for e in buf if e[0] >= wm_us]
        if expired:
            types = [ty for _, _, ty in expired]
            seq = ([last_type] if has_last else []) + types
            last_type, has_last = types[-1], True
            pairs = [
                (a, b) for a, b in zip(seq[:-1], seq[1:]) if b is not None
            ]
            if pairs:
                yield pd.DataFrame(
                    {
                        "from_type": [a for a, _ in pairs],
                        "to_type": [b for _, b in pairs],
                    }
                )
        state.update(
            (
                last_type,
                has_last,
                [e[0] for e in pending],
                [e[1] for e in pending],
                [e[2] for e in pending],
            )
        )
        if pending:
            # fire as soon as the earliest buffered event CAN expire
            # timeout is set in MILLISECONDS: the earliest pending event's
            # µs floor-divided to ms, +1 so the fire strictly passes it
            state.setTimeoutTimestamp(
                min(e[0] for e in pending) // 1000 + 1
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_neardup_minhash(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ingest-time near-duplicate detection — the streaming twin of
    ``operators/dedup.py::minhash_lsh_pairs``'s banding stage, for the
    dedup-on-arrival story a continuously-fed training corpus needs.

    Each arriving document computes its 8-hash md5 minhash signature with
    PURE per-row expressions (``array_min`` over the distinct-token array
    — no explode/groupBy, so the plan stays stateless up to the band
    grouping; per-row min over distinct tokens is by definition the same
    value the batch explode+groupBy min computes). Its 4 band buckets are
    then claimed first-wins in an ``applyInPandasWithState`` automaton
    keyed by ``(band_idx, band_val)``: the first document to claim a
    bucket passes silently, and every later document landing in an
    already-claimed bucket emits a ``(doc_id, band_idx, band_val,
    first_doc_id)`` hit row. ``min(first_doc_id) per doc_id`` downstream
    is the dedup decision (see the t_streaming_neardup catalog query).

    State per bucket is ONE long (the first claimant) — at 100 TB/day the
    state store holds one slim row per DISTINCT band bucket, which is the
    memory floor any dedup-against-history design pays; RocksDB state
    (session.py) keeps it off-heap, and a TTL timeout can bound it when
    the product semantics tolerate forgetting old buckets. Within a
    micro-batch documents are processed in ascending ``id_col`` order, so
    with an id-ordered replay the claimant of every bucket is its global
    minimum id — exactly the batch semantics, which is what makes this
    automaton oracle-checkable against plain SQL.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from data_pipeline_kafka_ek_spark.operators.dedup import NUM_BANDS, NUM_HASHES

    rows_per_band = NUM_HASHES // NUM_BANDS
    toks = F.array_distinct(F.split(F.col(text_col), " "))

    def min_hash(i: int):
        # NB: a two-arg transform lambda would receive the ARRAY INDEX as
        # its second argument — the seed must be bound via closure instead
        prefix = F.lit(f"{i}:")
        return F.array_min(F.transform(toks, lambda t: F.md5(F.concat(prefix, t))))

    sig = [min_hash(i) for i in range(NUM_HASHES)]

    def band_val(bidx: int):
        hs = sig[bidx * rows_per_band : (bidx + 1) * rows_per_band]
        val = hs[0]
        for h in hs[1:]:
            val = F.concat(val, F.lit("|"), h)
        return F.md5(val)

    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_idx"),
                band_val(b).alias("band_val"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    exploded = stream_df.select(
        F.col(id_col).alias("doc_id"), F.explode(bands).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_val")

    def update(key_tuple, pdfs, state):
        import pandas as pd

        first = state.get[0] if state.exists else None
        hits: list[tuple] = []
        # pdfs is an ITERATOR of Arrow chunks — the group's rows must be
        # gathered and sorted ONCE, or a low id in a later chunk would be
        # flagged as a dup of a higher id from an earlier chunk
        ids = sorted(int(x) for pdf in pdfs for x in pdf["doc_id"])
        for did in ids:
            if first is None:
                first = did
            elif did != first:
                hits.append((int(key_tuple[0]), key_tuple[1], did, first))
        state.update((first,))
        if hits:
            yield pd.DataFrame(
                hits, columns=["band_idx", "band_val", "doc_id", "first_doc_id"]
            )

    return exploded.groupBy("band_idx", "band_val").applyInPandasWithState(
        update,
        outputStructType=(
            "band_idx int, band_val string, doc_id long, first_doc_id long"
        ),
        stateStructType="first long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_distinct_stateful(
    stream_df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Streaming KMV distinct-count — the mergeable-sketch answer to
    COUNT(DISTINCT) over an unbounded stream, as an
    ``applyInPandasWithState`` automaton keyed by ``group_col``.

    State per key is the k smallest md5 hashes of values seen so far
    (the KMV invariant: a dropped hash can never re-enter because the
    k-th-smallest threshold only moves down) plus a row counter — at
    most k * 32 hex chars per key, FOREVER, regardless of stream volume;
    that boundedness is the whole point versus exact distinct state.
    Because the sketch is a commutative/idempotent merge, the final
    state is replay-order-invariant — which is what lets the id-ordered
    streaming run hash-match a plain batch SQL oracle. Each batch emits
    the key's current ``(n_sketch, kmv_estimate, rows_seen)`` revision;
    ``rows_seen`` strictly grows per emission, so max(rows_seen) selects
    the final estimate downstream. The estimator and the hash mapping
    are identical to ``operators/sketches.py::kmv_distinct`` (estimate =
    (k-1)/frac(h_k) once the sketch fills; half-up rounding to match the
    SQL oracle's round()). Hashing happens map-side as a JVM md5
    expression; NULL groups/values are excluded up front (the
    COUNT(DISTINCT) convention shared with the batch sketch and oracle).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "grp string, n_sketch long, kmv_estimate long, rows_seen long"
    state_schema = "hashes array<string>, rows long"

    # hash MAP-SIDE with the same JVM md5 expression the batch sketch
    # uses — the Python automaton only merges digest strings into a set,
    # never hashes. NULL groups/values are excluded (COUNT(DISTINCT)
    # convention, mirrored in the oracle); rows_seen counts survivors.
    prep = stream_df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.md5(F.col(value_col).cast("string")).alias("h"),
    )

    def update(key_tuple, pdfs, state):
        import math

        import pandas as pd

        hashes, rows = state.get if state.exists else ([], 0)
        hs = set(hashes)
        for pdf in pdfs:
            rows += len(pdf)
            hs.update(pdf["h"])
        top = sorted(hs)[:k]
        state.update((top, rows))
        n = len(top)
        if n < k:
            est = n
        else:
            frac = int(top[-1][:15], 16) / float(16**15)
            est = int(math.floor((k - 1) / frac + 0.5))
        yield pd.DataFrame(
            {
                "grp": [str(key_tuple[0])],
                "n_sketch": [n],
                "kmv_estimate": [est],
                "rows_seen": [rows],
            }
        )

    return prep.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_distinct_stateful(
    stream_df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Streaming HyperLogLog distinct-count — the fixed-size companion to
    :func:`kmv_distinct_stateful`: state per key is exactly ``2**p``
    max-rho registers (one small int each) plus a row counter, FOREVER,
    regardless of stream volume — smaller and flatter than KMV's k
    sorted digests, and the register update is a pure element-wise max,
    so the final state is replay-order-invariant (what lets the
    streaming run hash-match a batch SQL oracle). Register derivation
    and estimator are byte-identical to
    ``operators/sketches.py::hll_distinct``: md5 hex -> register +
    leading-zero rho, exact integer harmonic denominator, one float
    division, half-up rounding, small-range linear counting.

    Emits each key's ``(n_registers, hll_estimate, rows_seen)`` revision
    per batch; ``rows_seen`` strictly grows, so max(rows_seen) selects
    the final estimate downstream.

    The register coordinates (md5 -> register index + leading-zero rho)
    are computed MAP-SIDE as JVM codegen expressions (the identical
    columns the batch sketch builds), so the Python automaton never
    hashes: each Arrow batch folds into the register array with one
    ``np.maximum.at`` — no per-row Python anywhere. NULL groups/values
    are excluded up front (COUNT(DISTINCT) convention, mirrored in the
    oracle); ``rows_seen`` counts the surviving rows.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    m = 1 << p
    hex_b = p // 4
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << 61)

    out_schema = "grp string, n_registers long, hll_estimate long, rows_seen long"
    state_schema = "regs array<int>, rows long"

    h = F.md5(F.col(value_col).cast("string"))
    wv = F.conv(F.substring(h, hex_b + 1, 15), 16, 10).cast("long")
    rho = F.when(wv == 0, F.lit(61)).otherwise(
        F.lit(60) - F.length(F.bin(wv)) + F.lit(1)
    )
    prep = (
        stream_df.filter(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("grp"),
            F.conv(F.substring(h, 1, hex_b), 16, 10).cast("int").alias("reg"),
            rho.cast("int").alias("rho"),
        )
    )

    def update(key_tuple, pdfs, state):
        import math

        import numpy as np
        import pandas as pd

        regs, rows = state.get if state.exists else ([0] * m, 0)
        regs = np.asarray(regs, dtype=np.int64)
        for pdf in pdfs:
            rows += len(pdf)
            np.maximum.at(
                regs,
                pdf["reg"].to_numpy(dtype=np.int64),
                pdf["rho"].to_numpy(dtype=np.int64),
            )
        regs = [int(r) for r in regs]
        state.update((regs, rows))
        n_present = sum(1 for r in regs if r > 0)
        # exact integer harmonic denominator in Python ints (sums of
        # 2^61-scale terms overflow int64; m iterations per emission only)
        total = sum(1 << (61 - r) for r in regs if r > 0) + (
            m - n_present
        ) * (1 << 61)
        e_raw = num / float(total)
        v_empty = m - n_present
        if e_raw <= 2.5 * m and v_empty > 0:
            e = float(m) * math.log(float(m) / v_empty)
        else:
            e = e_raw
        yield pd.DataFrame(
            {
                "grp": [str(key_tuple[0])],
                "n_registers": [n_present],
                "hll_estimate": [int(math.floor(e + 0.5))],
                "rows_seen": [rows],
            }
        )

    return prep.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def psi_drift_stateful(
    stream_df: DataFrame,
    baseline: "dict[str, tuple[float, float, list[int]]]",
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 10,
    threshold: float = 0.2,
) -> DataFrame:
    """Streaming PSI drift monitor — the standing-query twin of
    ``relational.distribution_drift``: the baseline window's per-group
    ``(lo, hi, bin_counts)`` rides in as a broadcast-sized literal
    (computed once, batch-side), and the stream accumulates ONLY the
    current-window histogram as per-key state (``n_bins`` counters,
    fixed size forever). Every batch emits the key's current
    ``(n_current, psi, drifted, rows_seen)`` revision — the alert feed
    for "this metric's distribution is moving", updating as data
    arrives instead of waiting for a batch job.

    Bin assignment, add-one smoothing and the PSI fold are numerically
    identical to the batch operator, and counter accumulation is
    order-invariant, so the final revision per key hash-matches the
    batch result. Keys absent from the baseline are ignored (no
    reference distribution), exactly like the batch twin.
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "grp string, n_baseline long, n_current long, psi double, "
        "drifted boolean, rows_seen long"
    )
    state_schema = "counts array<long>, rows long"

    def update(key_tuple, pdfs, state):
        import numpy as np
        import pandas as pd

        grp = str(key_tuple[0])
        if grp not in baseline:
            # drain the iterator (contract) and emit nothing
            for _ in pdfs:
                pass
            return
        lo, hi, base_counts = baseline[grp]
        counts, rows = state.get if state.exists else ([0] * n_bins, 0)
        counts = np.asarray(counts, dtype=np.int64)
        width = (hi - lo) / float(n_bins)
        for pdf in pdfs:
            rows += len(pdf)
            v = pdf[value_col].to_numpy(dtype=float)
            if hi == lo:
                # degenerate baseline: bin on equality (moved constant ->
                # edge bin), mirroring the batch twin and the oracle
                b = np.where(v == lo, 0, n_bins - 1)
            else:
                b = np.clip(
                    np.floor((v - lo) / width), 0, n_bins - 1
                ).astype(np.int64)
            counts += np.bincount(b, minlength=n_bins)
        counts = [int(c) for c in counts]
        state.update((counts, rows))
        nb = sum(base_counts)
        nc = sum(counts)
        psi = 0.0
        for cb, cc in zip(base_counts, counts):
            p = (cb + 1) / (nb + n_bins)
            q = (cc + 1) / (nc + n_bins)
            psi += (p - q) * math.log(p / q)
        psi4 = math.floor(psi * 10_000 + 0.5) / 10_000 if psi >= 0 else -math.floor(-psi * 10_000 + 0.5) / 10_000
        import pandas as pd

        yield pd.DataFrame(
            {
                "grp": [grp],
                "n_baseline": [nb],
                "n_current": [nc],
                "psi": [psi4],
                "drifted": [psi4 > threshold],
                "rows_seen": [rows],
            }
        )

    return stream_df.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_grid_stateful(
    stream_df: DataFrame,
    value_col: str = "user_id",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Streaming Count-Min grid — completes the streaming sketch trio
    (KMV, HLL, CMS): each arriving row fans out MAP-SIDE (JVM
    expressions, before any Python) to its ``depth`` (i, j) grid
    coordinates — the identical md5 bucketing as
    ``operators/sketches.py::countmin_freq`` — and the stateful
    automaton is keyed by the grid ROW index, so the sketch runs as
    ``depth`` parallel keyed states of exactly ``width`` counters each:
    fixed size forever, and counter addition is order-invariant, so the
    final revision equals the batch grid. Each batch emits the row's
    full counter vector as (i, j, counter) rows plus a strictly-growing
    ``rows_seen`` for last-revision selection; frequency ESTIMATES are
    read off the final grid downstream (min over a value's d buckets) —
    the grid is the state, the read is a join.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "i int, j int, counter long, rows_seen long"
    state_schema = "counts array<long>, rows long"

    # NULL values excluded before the fan-out (same convention as the
    # batch sketch: a NULL hashes to a NULL bucket no reader can probe)
    fan = stream_df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("v"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
    ).withColumn(
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"), F.lit(":"), F.col("v")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % width
        ).cast("int"),
    )

    def update(key_tuple, pdfs, state):
        import numpy as np
        import pandas as pd

        counts, rows = state.get if state.exists else ([0] * width, 0)
        counts = np.asarray(counts, dtype=np.int64)
        for pdf in pdfs:
            rows += len(pdf)
            # vectorized per-batch counter add — the whole Arrow batch
            # folds in one bincount, no per-row Python
            counts += np.bincount(
                pdf["j"].to_numpy(dtype=np.int64), minlength=width
            )
        counts = [int(c) for c in counts]
        state.update((counts, rows))
        i = int(key_tuple[0])
        yield pd.DataFrame(
            {
                "i": [i] * width,
                "j": list(range(width)),
                "counter": counts,
                "rows_seen": [rows] * width,
            }
        )

    return fan.groupBy("i").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stateful(
    stream_df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 8,
) -> DataFrame:
    """Streaming heavy hitters via a mergeable Misra-Gries summary
    (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
    "Mergeable summaries"): per key the state is at most ``k``
    (value, counter) pairs plus one cumulative-decrement scalar, FOREVER — the bounded-state answer
    to "which values dominate this stream" that exact top-k state cannot
    give. Completes the streaming sketch quartet: KMV/HLL (how many
    distinct), CMS (how often is THIS value), MG (WHICH values are hot).

    Each batch folds in as one vectorized value_counts, then the two
    summaries merge: add counters for known values, admit new values
    while the summary has room, else subtract the (k+1)-th largest
    counter from everyone and drop the non-positives (recording the
    subtraction as per-survivor ``error``). The classic guarantees —
    asserted by tests/test_streaming.py over replays, NOT assumed:

    * every value with true frequency > N/(k+1) is present;
    * for every reported value,
      ``est_count <= true <= est_count + max_error`` and
      ``max_error <= N/(k+1)`` (column names avoid ``count``/``error``,
      which collide with Row tuple methods).

    Unlike KMV/HLL/CMS the surviving SET can depend on arrival order in
    tie cases, so this operator is guarantee-tested rather than
    hash-oracle-checked (the documented boundary: order-invariant
    automata get DuckDB oracles, order-dependent summaries get property
    gates). Emits each key's full summary per batch with a strictly
    growing ``rows_seen`` for final-revision selection.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "grp string, value string, est_count long, max_error long, "
        "rows_seen long"
    )
    state_schema = "vals array<string>, counts array<long>, delta long, rows long"

    prep = stream_df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("string").alias("v"),
    )

    def update(key_tuple, pdfs, state):
        import pandas as pd

        if state.exists:
            vals, counts, delta, rows = state.get
            summary = {v: int(c) for v, c in zip(vals, counts)}
            delta = int(delta)
        else:
            summary, delta, rows = {}, 0, 0
        for pdf in pdfs:
            rows += len(pdf)
            batch = pdf["v"].value_counts()  # vectorized fold per batch
            for v, c in batch.items():
                summary[v] = summary.get(v, 0) + int(c)
            if len(summary) > k:
                # MG compaction: subtract the (k+1)-th largest counter,
                # drop non-positives. The cumulative subtraction DELTA is
                # the one-sided error bound for EVERY item — including a
                # value readmitted after an earlier eviction, whose missed
                # occurrences are also <= delta (the classic analysis;
                # tracking per-item errors would under-report exactly that
                # readmission case).
                cut = sorted(summary.values(), reverse=True)[k]
                delta += cut
                summary = {
                    v: c - cut for v, c in summary.items() if c - cut > 0
                }
        items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            ([v for v, _ in items], [c for _, c in items], delta, rows)
        )
        grp = str(key_tuple[0])
        yield pd.DataFrame(
            {
                "grp": [grp] * len(items),
                "value": [v for v, _ in items],
                "est_count": [c for _, c in items],
                "max_error": [delta] * len(items),
                "rows_seen": [rows] * len(items),
            }
        )

    return prep.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
