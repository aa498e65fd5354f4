"""SparkSession factory with scale-oriented defaults.

The reference stack hand-tunes its runtime via docker-compose memory limits
(reference: ecs-params.yml:4-21); here the equivalent surface is Spark conf.
Defaults are chosen so the SAME code runs on local[32] for tests and on a
1000-executor cluster for 100 TB:

* AQE on (runtime coalescing, skew-join splitting, dynamic join strategy);
* shuffle partitions sized from the env, not the 200 default;
* UTC session timezone (deterministic timestamp semantics, SURVEY.md §7.3);
* Arrow enabled for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_pipeline_kafka_ek_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to ``SPARK_GRAFT_CPUS`` (the local test
    rig) — on a real cluster you would set it to 2-3x total executor cores
    or simply rely on AQE coalescing from a high initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing equates bytes with cost; the near-dup verify stages
        # carry slim rows (pair ids) with quadratic-ish CPU per row, and the
        # default 1 MB floor collapses them to one task. parallelismFirst
        # already refuses to coalesce below cluster parallelism EXCEPT under
        # this floor — lower it so compute-dense small-bytes shuffles keep
        # their parallelism; genuinely big shuffles are unaffected (their
        # per-partition bytes dwarf 16 KB at any scale).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # fixture `events.ts` is parquet TIMESTAMP(NANOS). Spark 3.x needs
        # this conf to read it (as long ns); Spark 4.x removed the conf and
        # reads it as TIMESTAMP_NTZ. sources/tables.py branches on the
        # observed dtype, so setting it here is harmless on 4.x.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # local mode: one JVM; driver memory is the only knob that matters
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # streaming state at scale: RocksDB survives large keyed state
        # (SURVEY.md §4.2 #4 — the reference keeps state in RocksDB too)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
