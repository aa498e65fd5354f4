"""ACID transaction-log table (sources/acid.py): the guarantees the
MaterializedTable docstring defers to a real table format — atomic
commits, optimistic concurrency, snapshot isolation / time travel,
idempotent streaming MERGE, checkpointed log replay, and stats-pruned
merge rewrites — each proven directly against the log on disk."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.sources.acid import (
    ConcurrentModification,
    TxnLogTable,
)


def _table(spark, tmp_path, **kw) -> TxnLogTable:
    return TxnLogTable(
        spark, str(tmp_path / "tbl"), key="k", order_col="seq", **kw
    )


def _rows(t, version=None):
    return {
        (r.k): (r.seq, r.v) for r in t.read(version).select("k", "seq", "v").collect()
    }


def test_append_and_snapshot_read(spark, tmp_path):
    t = _table(spark, tmp_path)
    df1 = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "k long, seq long, v string")
    v0 = t.append(df1)
    assert v0 == 0
    assert _rows(t) == {1: (1, "a"), 2: (1, "b")}
    df2 = spark.createDataFrame([(3, 1, "c")], "k long, seq long, v string")
    v1 = t.append(df2)
    assert v1 == 1
    assert _rows(t) == {1: (1, "a"), 2: (1, "b"), 3: (1, "c")}
    # time travel: version 0 still reads the original two rows
    assert _rows(t, version=0) == {1: (1, "a"), 2: (1, "b")}
    ops = [h["op"] for h in t.history()]
    assert ops == ["append", "append"]


def test_merge_upserts_deletes_and_wins_by_order(spark, tmp_path):
    t = _table(spark, tmp_path)
    base = spark.createDataFrame(
        [(k, 1, f"v{k}") for k in range(1, 6)], "k long, seq long, v string"
    )
    t.append(base)
    changes = spark.createDataFrame(
        [
            (2, 5, "v2-new", False),   # newer seq: wins
            (3, 0, "v3-stale", False), # older seq: existing row wins
            (4, 9, "gone", True),      # delete
            (6, 1, "v6", False),       # brand-new key
        ],
        "k long, seq long, v string, deleted boolean",
    )
    t.merge(changes, delete_col="deleted")
    assert _rows(t) == {
        1: (1, "v1"),
        2: (5, "v2-new"),
        3: (1, "v3"),
        5: (1, "v5"),
        6: (1, "v6"),
    }
    # snapshot isolation: the pre-merge version still reads the old state
    assert _rows(t, version=0)[4] == (1, "v4")


def test_merge_equals_batch_latest_per_key_oracle(spark, tmp_path):
    """A sequence of merges must equal one batch latest-per-key fold over
    the concatenated changelog (the MaterializedTable equivalence)."""
    import random

    rng = random.Random(11)
    t = _table(spark, tmp_path)
    log = []
    seq = 0
    for _ in range(4):
        batch = []
        for _ in range(25):
            seq += 1
            batch.append((rng.randint(1, 12), seq, f"s{seq}"))
        log.extend(batch)
        t.merge(spark.createDataFrame(batch, "k long, seq long, v string"))
    expect = {}
    for k, s, v in log:
        if k not in expect or s > expect[k][0]:
            expect[k] = (s, v)
    assert _rows(t) == expect


def _inject_racing_commit(t, actions_fn):
    """Wrap t._try_commit so a competing commit lands at the exact version
    this writer is about to claim — the true snapshot->commit race window."""
    orig = t._try_commit
    state = {"fired": False}

    def sabotaged(version, op, actions, txn):
        if not state["fired"]:
            state["fired"] = True
            evil = {
                "version": version,
                "op": "competing",
                "actions": actions_fn(),
                "txn": None,
            }
            assert t._write_text_atomic(t._commit_path(version), json.dumps(evil))
        return orig(version, op, actions, txn)

    t._try_commit = sabotaged
    return state


def test_commit_race_append_retries_merge_conflicts(spark, tmp_path):
    # append race: the competitor lands a harmless commit at our version;
    # the blind append must retry past it (its files are already on disk)
    t = _table(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 1, "a")], "k long, seq long, v string"))
    _inject_racing_commit(t, lambda: [])
    v = t.append(spark.createDataFrame([(2, 1, "b")], "k long, seq long, v string"))
    assert v == 2  # version 1 went to the competitor
    assert _rows(t)[2] == (1, "b")
    assert t._read_commit(1)["op"] == "competing"

    # merge race: the competitor REMOVES the very file this merge read
    # between snapshot and commit — the merge must raise, never silently
    # resurrect rows the winner rewrote
    t2 = _table(spark, tmp_path)
    target = [
        a for a in t2._snapshot_adds() if a["min_key"] <= 1 <= a["max_key"]
    ][0]
    _inject_racing_commit(t2, lambda: [{"remove": {"path": target["path"]}}])
    with pytest.raises(ConcurrentModification):
        t2.merge(
            spark.createDataFrame([(1, 9, "z")], "k long, seq long, v string"),
            max_retries=3,
        )


def test_idempotent_txn_skips_replayed_batch(spark, tmp_path):
    t = _table(spark, tmp_path)
    b0 = spark.createDataFrame([(1, 1, "a")], "k long, seq long, v string")
    t.merge(b0, txn={"app_id": "app", "batch_id": 0})
    v_before = t.latest_version()
    # replay of batch 0 (and a stale batch after batch 1) must be no-ops
    t.merge(
        spark.createDataFrame([(1, 2, "dup")], "k long, seq long, v string"),
        txn={"app_id": "app", "batch_id": 0},
    )
    assert t.latest_version() == v_before
    assert _rows(t)[1] == (1, "a")
    t.merge(
        spark.createDataFrame([(2, 1, "b")], "k long, seq long, v string"),
        txn={"app_id": "app", "batch_id": 1},
    )
    t.merge(
        spark.createDataFrame([(9, 9, "stale")], "k long, seq long, v string"),
        txn={"app_id": "app", "batch_id": 0},
    )
    assert 9 not in _rows(t)
    # a different app id is independent
    t.merge(
        spark.createDataFrame([(3, 1, "c")], "k long, seq long, v string"),
        txn={"app_id": "other", "batch_id": 0},
    )
    assert _rows(t)[3] == (1, "c")


def test_checkpoint_bounds_log_replay(spark, tmp_path):
    t = _table(spark, tmp_path, checkpoint_interval=5)
    for i in range(12):
        t.append(
            spark.createDataFrame([(i, 1, f"v{i}")], "k long, seq long, v string")
        )
    ckpt = t._last_checkpoint()
    assert ckpt is not None and ckpt[0] == 10
    # snapshot from checkpoint+tail equals full-log replay
    full = {}
    for v in t._list_versions():
        for a in t._read_commit(v)["actions"]:
            if "add" in a:
                full[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                full.pop(a["remove"]["path"], None)
    assert {a["path"] for a in t._snapshot_adds()} == set(full)
    assert len(_rows(t)) == 12


def test_merge_stats_pruning_rewrites_only_overlapping_files(spark, tmp_path):
    """The 100 TB property: a merge touching a narrow key range must
    rewrite only the files whose [min,max] stats overlap it."""
    t = _table(spark, tmp_path, files_per_commit=4)
    base = spark.createDataFrame(
        [(k, 1, f"v{k}") for k in range(1, 401)], "k long, seq long, v string"
    )
    t.append(base)
    n_before = t.file_count()
    assert n_before >= 3  # range clustering actually split the key space
    t.merge(
        spark.createDataFrame([(5, 7, "new5")], "k long, seq long, v string")
    )
    c = t._read_commit(t.latest_version())
    removed = sum(1 for a in c["actions"] if "remove" in a)
    assert removed == 1, c["actions"]  # only the file holding key 5
    assert _rows(t)[5] == (7, "new5")
    assert _rows(t)[400] == (1, "v400")


def test_streaming_foreach_batch_merge_is_exactly_once(spark, tmp_path):
    """foreachBatch -> TxnLogTable.merge with txn ids: the final table
    equals the batch latest-per-key fold of the replayed changelog, and a
    manual re-application of the last batch changes nothing."""
    from data_pipeline_kafka_ek_spark.operators.relational import latest_per_key
    from data_pipeline_kafka_ek_spark.streaming import runtime

    changes = spark.createDataFrame(
        [(i, i % 7, f"s{i}") for i in range(60)], "seq long, k long, v string"
    )
    t = _table(spark, tmp_path)
    stream = runtime.replayed_stream(spark, changes, n_slices=3, order_col="seq")
    q = (
        stream.writeStream.foreachBatch(t.foreach_batch_writer("cdc-app"))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    expect = {
        r.k: (r.seq, r.v)
        for r in latest_per_key(changes, "k", [F.desc("seq")]).collect()
    }
    assert _rows(t) == expect
    # replay the final batch id by hand: idempotent, no new version
    v = t.latest_version()
    last_batch = int(
        max(h["txn"]["batch_id"] for h in t.history() if h["txn"])
    )
    t.merge(
        changes.limit(5),
        txn={"app_id": "cdc-app", "batch_id": last_batch},
    )
    assert t.latest_version() == v


def test_unreferenced_files_lists_only_orphans(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 1, "a")], "k long, seq long, v string"))
    assert t.unreferenced_files() == []
    # drop an orphan parquet into the files area: it must be flagged
    import shutil

    live = t._snapshot_adds()[0]["path"].replace("file:", "")
    orphan = str(tmp_path / "tbl" / "files" / "c-orphan" / "part-orphan.parquet")
    import os

    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    shutil.copy(live, orphan)
    orphans = t.unreferenced_files()
    assert len(orphans) == 1 and orphans[0].endswith("part-orphan.parquet")


def test_concurrent_appends_all_land(spark, tmp_path):
    """Real thread-level concurrency: N writers race blind appends at the
    same table. Optimistic retry must land every commit exactly once —
    contiguous versions, every row present, no file lost or duplicated."""
    from concurrent.futures import ThreadPoolExecutor

    t = _table(spark, tmp_path)
    dfs = [
        spark.createDataFrame(
            [(100 * w + j, 1, f"w{w}r{j}") for j in range(5)],
            "k long, seq long, v string",
        )
        for w in range(6)
    ]
    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = list(ex.map(lambda df: t.append(df, max_retries=50), dfs))
    assert sorted(versions) == list(range(6))  # contiguous, no gaps
    got = _rows(t)
    assert len(got) == 30
    assert all(got[100 * w + j] == (1, f"w{w}r{j}") for w in range(6) for j in range(5))
    assert [h["op"] for h in t.history()] == ["append"] * 6


def test_cdc_stream_into_acid_table_feeds_enrichment_join(spark, tmp_path):
    """The reference's core flow on ACID storage: a CDC change stream
    MERGEs into the TxnLogTable exactly-once (foreachBatch), and the
    table's current snapshot serves the stream-static enrichment join
    (J1) — final join output equals the batch recompute over the
    changelog's latest-per-key state."""
    from pyspark.sql import functions as F

    from data_pipeline_kafka_ek_spark.operators.relational import latest_per_key
    from data_pipeline_kafka_ek_spark.streaming import runtime

    changes = spark.createDataFrame(
        [(i, i % 5, f"name{i}", i % 2 == 0) for i in range(40)],
        "seq long, k long, name string, active boolean",
    )
    t = _table(spark, tmp_path)
    stream = runtime.replayed_stream(spark, changes, n_slices=4, order_col="seq")
    q = (
        stream.writeStream.foreachBatch(t.foreach_batch_writer("dim-cdc"))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()

    facts = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "event_id long, k long"
    )
    dim = t.read().select("k", "name", "active")
    got = {
        (r.event_id): (r.name, r.active)
        for r in facts.join(F.broadcast(dim), "k", "left")
        .filter(F.col("name").isNotNull())
        .collect()
    }
    latest = {
        r.k: (r.name, r.active)
        for r in latest_per_key(changes, "k", [F.desc("seq")]).collect()
    }
    expect = {
        i: latest[i % 7] for i in range(50) if (i % 7) in latest
    }
    assert got == expect and len(got) > 0


def test_orphaned_claims_detected_and_skipped(spark, tmp_path):
    """A claim whose owner died before publishing parks only its own
    version: the next writer lands at the following number (a log gap,
    tolerated by replay), and the orphan is listed for cleanup while
    claims of PUBLISHED commits are not."""
    t = _table(spark, tmp_path)
    t.append(spark.createDataFrame([(1, 1, "a")], "k long, seq long, v string"))
    assert t.orphaned_claims() == []
    # simulate a crashed writer: claim version 1, never publish
    fs, cpath = t._fs(t._commit_path(1) + ".claim")
    assert fs.createNewFile(cpath)
    v = t.append(spark.createDataFrame([(2, 1, "b")], "k long, seq long, v string"))
    assert v == 2  # skipped the parked number
    assert _rows(t) == {1: (1, "a"), 2: (1, "b")}
    orphans = t.orphaned_claims()
    assert len(orphans) == 1 and orphans[0].endswith("00000000000000000001.json.claim")
