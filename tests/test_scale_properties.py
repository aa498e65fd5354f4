"""Executable evidence for the SCALE.md claims: bucketing elides the
join exchange, date-partitioned layout prunes at the scan, and streaming
checkpoints make restarts exactly-once. These are plan/recovery
assertions, not timings — they hold at any scale factor."""

import glob
import os
import uuid

import pyspark.sql.functions as F

from data_pipeline_kafka_ek_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_bucketed_join_elides_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key => zero-shuffle sort-merge join
    (the recurring-join layout SCALE.md prescribes for 100 TB facts)."""
    ev_tbl = f"ev_bkt_{uuid.uuid4().hex[:8]}"
    cust_tbl = f"cust_bkt_{uuid.uuid4().hex[:8]}"
    prior_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        events = load_table(spark, sf_dir, "events")
        customer = load_table(spark, sf_dir, "customer")
        events.write.bucketBy(8, "user_id").sortBy("user_id").mode(
            "overwrite"
        ).saveAsTable(ev_tbl)
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_name"
        ).write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable(
            cust_tbl
        )
        joined = spark.table(ev_tbl).join(spark.table(cust_tbl), "user_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the same rows as the unbucketed join
        plain = events.join(
            customer.select(F.col("c_custkey").alias("user_id"), "c_name"), "user_id"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_threshold)
        spark.sql(f"DROP TABLE IF EXISTS {ev_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {cust_tbl}")


def test_date_partitioned_layout_prunes_scan(spark, sf_dir, tmp_path):
    """Writing the fact table date-partitioned => a date predicate becomes
    a PartitionFilter (directories never read), not a row filter."""
    out = str(tmp_path / "events_by_day")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    events.write.partitionBy("event_date").mode("overwrite").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-05")
    plan = _plan(df)
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    n_dirs = len(glob.glob(os.path.join(out, "event_date=*")))
    assert n_dirs > 1  # layout really is partitioned
    expected = events.filter(F.col("event_date") == "2024-01-05").count()
    assert df.count() == expected > 0


def test_streaming_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Stop a file-sink streaming query after the first micro-batch and
    restart with the SAME checkpoint: the restart resumes from the
    recorded offsets — output has every input row exactly once."""
    from data_pipeline_kafka_ek_spark.streaming import runtime

    events = load_table(spark, sf_dir, "events").limit(400)
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    # wait for at least one committed batch, then stop mid-stream
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] > 0:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    q2 = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        done = spark.read.parquet(out).count() >= 400
        if done:
            break
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    want = sorted(r.event_id for r in events.collect())
    assert got == want, "restart lost or duplicated rows"


def test_skewed_enrichment_join_triggers_aqe_skew_split(spark):
    """The J1 enrichment join normally broadcasts the dimension (no skew
    exposure). When the dimension outgrows broadcast and the join falls
    back to sort-merge, a celebrity fact key must trigger AQE's skew-join
    split — this pins the config contract (skewJoin enabled + thresholds)
    that SCALE.md relies on at 100 TB."""
    from data_pipeline_kafka_ek_spark.operators.relational import (
        enrich_stream_with_table,
    )

    restore = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        # one celebrity key (~30k rows, padded payload) among 200 cold keys
        hot = spark.range(30000).select(
            F.lit(7).alias("user_id"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        cold = spark.range(2000).select(
            (F.col("id") % 200 + 100).cast("int").alias("user_id"),
            F.col("id").cast("string").alias("payload"),
        )
        # no explicit repartition: AQE only splits ENSURE_REQUIREMENTS
        # shuffles (a user-demanded REPARTITION_BY_NUM is left alone)
        fact = hot.union(cold)
        dim = spark.range(500).select(
            F.col("id").cast("int").alias("user_id"),
            F.concat(F.lit("name_"), F.col("id")).alias("c_name"),
        )
        joined = enrich_stream_with_table(
            fact,
            dim,
            on=fact["user_id"] == dim["user_id"],
            how="inner",
            broadcast_table=False,  # the too-big-to-broadcast dimension case
        )
        joined.collect()  # AQE decides skew split at runtime: execute first
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "skew=true" in plan, f"AQE skew split did not trigger:\n{plan}"
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)


def test_dedup_hot_token_candidate_join_triggers_aqe_skew_split(spark):
    """SCALE.md's residual-skew claim for the near-dup verify pipeline
    (dedup.py candidate join): prefix filtering removes hot tokens by
    design, so this runs WITHOUT it — a stop-word token shared by every
    doc must make AQE split the skewed posting partition at runtime
    rather than serialize the candidate join on one task."""
    from data_pipeline_kafka_ek_spark.operators.dedup import jaccard_pairs

    restore = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # thresholds sized for the test corpus: shuffle-partition sizes are
    # COMPRESSED map-output bytes, and 500 copies of one identical token
    # lz4 down to a few KB — the production defaults (256MB) express the
    # same contract at cluster scale
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        # every doc carries the same long stop-word token plus 3 unique
        # tokens: the stop-word's posting partition dwarfs every other,
        # and the small per-doc token count keeps the quadratic hot-bucket
        # candidate fan-out test-sized
        hot_tok = "the_celebrity_stopword_" + "x" * 48
        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(hot_tok + " "),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(F.lit(f"w{j}_"), F.col("id").cast("string"))
                        for j in range(3)
                    ],
                ),
            ).alias("text"),
        )
        pairs = jaccard_pairs(docs, threshold=0.9, prefix_filter=False)
        pairs.collect()  # AQE decides at runtime: execute first
        plan = _plan(pairs)
        assert "SortMergeJoin(skew=true) [tok" in plan, (
            f"AQE skew split did not trigger on the posting join:\n{plan}"
        )
        # and semantics hold: only the stop-word is shared, Jaccard 1/7
        assert pairs.count() == 0
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)


def test_salted_join_spreads_hot_key_and_matches_plain_join(spark):
    """The explicit fallback when AQE can't help (e.g. hot-key aggregation
    feeding a non-broadcastable join): salted_join must put the salt into
    the shuffle key — splitting the hot key across n_salts partitions —
    and return exactly the plain join's rows."""
    from data_pipeline_kafka_ek_spark.operators.skew import salted_join

    hot = spark.range(5000).select(
        F.lit(7).alias("k"), F.col("id").alias("uid")
    )
    cold = spark.range(500).select(
        (F.col("id") % 50 + 100).alias("k"), (F.col("id") + 100000).alias("uid")
    )
    fact = hot.union(cold)
    dim = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("v")
    )
    prior_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(fact, dim, "k", unique_col="uid", n_salts=8)
        plan = _plan(salted)
        assert "__salt" in plan and "hashpartitioning(k" in plan, plan
        got = {(r.k, r.uid, r.v) for r in salted.collect()}
        want = {(r.k, r.uid, r.v) for r in fact.join(dim, "k").collect()}
        assert got == want
        # the hot key's rows really spread: count distinct shuffle salts
        n_salts_used = (
            fact.filter(F.col("k") == 7)
            .select(F.pmod(F.hash("uid"), F.lit(8)).alias("s"))
            .distinct()
            .count()
        )
        assert n_salts_used == 8
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_threshold)


def test_lake_bucketed_join_elides_exchange(spark, sf_dir, tmp_path):
    """Layout contract proof via the lake helpers (a distinct name from the
    saveAsTable variant above — a duplicate def would silently shadow it):
    two tables bucketed by the same key into the same bucket count must
    sort-merge join with ZERO Exchange (the shuffle was paid once at write
    time) — the co-located-join posture a 100 TB fact table relies on.
    Also proves the negative: the same join over plain parquet plans at
    least one Exchange."""
    from data_pipeline_kafka_ek_spark.sources.lake import (
        read_table,
        write_bucketed,
    )

    ev_tbl = f"ev_b_{uuid.uuid4().hex[:8]}"
    us_tbl = f"us_b_{uuid.uuid4().hex[:8]}"
    prior_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
        users = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        write_bucketed(events, ev_tbl, ["user_id"], n_buckets=8)
        write_bucketed(users, us_tbl, ["user_id"], n_buckets=8)
        joined = read_table(spark, ev_tbl).join(read_table(spark, us_tbl), "user_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        # negative control: un-bucketed inputs must shuffle
        plain = events.join(users, "user_id")
        plain_plan = plain._sc._jvm.PythonSQLUtils.explainString(
            plain._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" in plain_plan
        # and the result is identical either way
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_threshold)
        spark.sql(f"DROP TABLE IF EXISTS {ev_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {us_tbl}")


def test_partitioned_write_prunes_with_lake_helper(spark, sf_dir, tmp_path):
    from data_pipeline_kafka_ek_spark.sources.lake import write_partitioned

    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "ev_part")
    write_partitioned(events, out, ["event_date"])
    got = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-03")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "event_date" in plan
    assert got.count() > 0


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (Spark's runtime row-level
    semi-join reduction): when the build side of a shuffle join carries a
    selective filter, Catalyst injects bloom_filter_might_contain on the
    probe side so fact rows that cannot match are dropped BEFORE the
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the ~1% that survives. The size
    thresholds are lowered to fire at fixture scale; the assertion is the
    plan shape (filter creation + probe-side application), which is
    scale-independent."""
    restore = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    try:
        events = load_table(spark, sf_dir, "events")
        customer = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"  # selective build side
        )
        joined = events.join(
            customer.select(F.col("c_custkey").alias("user_id"), "c_name"),
            "user_id",
        )
        plan = _plan(joined)
        assert "might_contain" in plan and "bloom_filter_agg" in plan, (
            f"runtime bloom filter was not injected:\n{plan}"
        )
        # and the pruned join still returns exactly the unpruned rows
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        unpruned = events.join(
            customer.select(F.col("c_custkey").alias("user_id"), "c_name"),
            "user_id",
        )
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        assert joined.count() == unpruned.count()
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)


def test_ivf_cells_as_partition_keys_prune_the_ann_scan(spark, sf_dir, tmp_path):
    """The ANN at-rest layout: corpus vectors written partitioned by their
    trained IVF cell make a probe query read ONLY the probed cells'
    directories (PartitionFilters at the scan, like any date-partitioned
    fact table) — at 100 TB of vectors this is the difference between
    scanning the corpus and scanning n_probe/n_cells of it. Result
    equality against the unpartitioned corpus is asserted."""
    from data_pipeline_kafka_ek_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids_lloyd(emb, 8, 2)
    assigned = similarity.assign_cells(emb, cents).select("vec_id", "cell")
    out = str(tmp_path / "emb_by_cell")
    emb.join(assigned, "vec_id").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(out)

    probed = [0, 3]  # pretend the query's 2 nearest cells
    df = spark.read.parquet(out).filter(F.col("cell").isin(probed))
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200], plan
    n_dirs = len(glob.glob(os.path.join(out, "cell=*")))
    assert n_dirs > 2  # layout really is cell-partitioned
    expected = {
        r.vec_id for r in assigned.filter(F.col("cell").isin(probed)).collect()
    }
    assert {r.vec_id for r in df.collect()} == expected and expected


def test_compaction_shrinks_file_count_and_preserves_rows(spark, sf_dir, tmp_path):
    """A micro-batch-fed table fragmented into ~200 files compacts to a
    handful sized by actual bytes, with identical content and (when
    requested) the partition layout preserved."""
    from data_pipeline_kafka_ek_spark.sources.lake import compact_table

    events = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    events.repartition(200).write.mode("overwrite").parquet(frag)
    before = len(glob.glob(os.path.join(frag, "**", "*.parquet"), recursive=True))
    assert before >= 150
    want = sorted(r.event_id for r in events.collect())

    n_after = compact_table(spark, frag, target_file_mb=128)
    assert n_after < before / 10
    got = sorted(r.event_id for r in spark.read.parquet(frag).collect())
    assert got == want

    # partition-preserving variant
    part = str(tmp_path / "part")
    events.withColumn("event_date", F.to_date("ts")).repartition(64).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(part)
    compact_table(spark, part, target_file_mb=128, partition_cols=["event_date"])
    assert len(glob.glob(os.path.join(part, "event_date=*"))) > 1
    df = spark.read.parquet(part).filter(F.col("event_date") == "2024-01-05")
    assert "PartitionFilters" in _plan(df)


def test_stateful_automaton_matches_under_rocksdb_state_store(spark):
    """SCALE.md prescribes the RocksDB state-store provider for standing
    streams at scale (bounded JVM heap; state spills to local disk).
    Parity proof: the HLL distinct automaton run under the RocksDB
    provider emits byte-identical final revisions to the default
    HDFS-backed in-memory provider — the sketch state round-trips
    RocksDB serialization without semantic drift."""
    from data_pipeline_kafka_ek_spark.streaming import runtime

    rows = [(i, f"t{i % 3}", i % 97) for i in range(800)]
    df = spark.createDataFrame(rows, "seq long, event_type string, user_id long")

    def final_revisions():
        stream = runtime.replayed_stream(spark, df, n_slices=4, order_col="seq")
        rev = runtime.run_available_now(
            runtime.hll_distinct_stateful(stream), output_mode="update"
        )
        out = {}
        for r in rev.collect():
            if r.grp not in out or r.rows_seen > out[r.grp][-1]:
                out[r.grp] = (r.n_registers, r.hll_estimate, r.rows_seen)
        return out

    key = "spark.sql.streaming.stateStore.providerClass"
    default = final_revisions()
    prior = spark.conf.get(key)
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    try:
        spark.conf.set(key, rocks)
        got = final_revisions()
    finally:
        spark.conf.set(key, prior)
    assert got == default
    assert set(got) == {"t0", "t1", "t2"}


def test_recall_eval_sample_cap_bounds_pair_join(spark, sf_dir):
    """x_dedup_recall_eval must be safe to point at any corpus size: when
    the table exceeds sample_cap, a deterministic hash-sample bounds the
    docs BOTH pair generators see, so the exact-truth side can never go
    quadratic in the full corpus. The fixture run (cap above table size)
    stays exact — the oracle hash does not move."""
    from data_pipeline_kafka_ek_spark.operators import dedup
    from data_pipeline_kafka_ek_spark.plans import extensions as ext

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert n >= 100

    # determinism + bound of the sampler itself
    cap = 60
    s1 = sorted(r.doc_id for r in dedup.hash_sample(docs, cap).select("doc_id").collect())
    s2 = sorted(r.doc_id for r in dedup.hash_sample(docs, cap).select("doc_id").collect())
    assert s1 == s2
    assert 0 < len(s1) <= 2 * cap
    # cap >= table size: the sample IS the table (fixture exactness)
    assert dedup.hash_sample(docs, n).count() == n

    # the eval feeds the SAMPLED docs to both pair generators
    seen = []
    orig_j, orig_m = dedup.jaccard_pairs, dedup.minhash_lsh_pairs

    def spy_j(d, **kw):
        seen.append(("jaccard", d.count()))
        return orig_j(d, **kw)

    def spy_m(d, **kw):
        seen.append(("minhash", d.count()))
        return orig_m(d, **kw)

    dedup.jaccard_pairs, dedup.minhash_lsh_pairs = spy_j, spy_m
    try:
        ext.x_dedup_recall_eval(spark, sf_dir, sample_cap=cap).collect()
    finally:
        dedup.jaccard_pairs, dedup.minhash_lsh_pairs = orig_j, orig_m
    assert {name for name, _ in seen} == {"jaccard", "minhash"}
    for name, n_in in seen:
        assert n_in <= 2 * cap, (name, n_in)


def test_domain_quota_phase_one_bounds_hot_source(spark):
    """The salted pre-truncation is the scale guarantee: feed one source
    100x the quota and assert (a) the final window's input — the phase-1
    survivors — is capped at quota x n_salts rows for the hot source,
    and (b) the kept set is exactly the quota smallest hash keys, i.e.
    the two-phase rewrite is EXACT, not approximate."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    rows = [(i, "hot") for i in range(5000)] + [
        (100000 + i, f"cold{i % 7}") for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    key = (
        (F.col("doc_id") % F.lit(2147483647)) * F.lit(2654435761)
    ) % F.lit(4294967296)
    # phase-1 twin: survivors per source never exceed 50 * 16
    from pyspark.sql import Window

    salted = Window.partitionBy(
        "source", F.pmod(F.col("__qkey"), F.lit(16))
    ).orderBy("__qkey", "doc_id")
    survivors = (
        df.select("doc_id", "source", key.alias("__qkey"))
        .withColumn("__r1", F.row_number().over(salted))
        .filter(F.col("__r1") <= 50)
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 50 * 16 for r in survivors)
    # exactness: the full pipeline equals the single-window reference
    import tempfile, os, shutil

    scratch = tempfile.mkdtemp(prefix="quota_scale_")
    try:
        df.write.mode("overwrite").parquet(os.path.join(scratch, "documents.parquet"))
        # reuse the registered plan against the scratch dir: it only reads
        # the documents table
        got = {
            (r.doc_id, r.source)
            for r in em.queries()["x_pipeline_domain_quota"](
                spark, scratch
            ).collect()
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    single = Window.partitionBy("source").orderBy("__qkey", "doc_id")
    want = {
        (r.doc_id, r.source)
        for r in df.select("doc_id", "source", key.alias("__qkey"))
        .withColumn("rn", F.row_number().over(single))
        .filter(F.col("rn") <= 50)
        .collect()
    }
    assert got == want
    hot_kept = [t for t in got if t[1] == "hot"]
    assert len(hot_kept) == 50
