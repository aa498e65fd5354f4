"""Lake layout management: partitioned and bucketed parquet tables.

At 100 TB the cheapest shuffle is the one you never run. Two layout
levers make that happen, both plain Spark table features:

* **Partitioning** (`partitionBy`): directory-level pruning — a filter on
  the partition column skips whole directories at planning time
  (`PartitionFilters` in the scan node). Choose low-cardinality,
  always-filtered columns (event date, language, source).
* **Bucketing** (`bucketBy` + `sortBy`): hash-clusters rows by the join/
  aggregation key into a fixed bucket count AT WRITE TIME. Two tables
  bucketed by the same key into the same bucket count join WITHOUT any
  Exchange — the shuffle was paid once, at ingest, and every subsequent
  join/groupBy on that key rides it for free. This is the batch twin of
  the reference's Kafka topic partitioning (reference: README.md — topics
  partitioned by key so ksqlDB joins are co-partitioned), and the
  standard warehouse trick for fact tables joined daily on the same key.

``tests/test_scale_properties.py`` proves both properties from the
executed plans (PartitionFilters present; zero Exchange in a
bucketed-bucketed join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: "list[str]",
    mode: str = "overwrite",
) -> None:
    """Write a directory-partitioned parquet table. Readers filtering on
    ``partition_cols`` prune at planning time (zero I/O for skipped
    partitions)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str]",
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) managed parquet
    table. Joins and aggregations keyed on ``bucket_cols`` between tables
    sharing the same bucketing then plan with NO Exchange (and with
    ``sort=True`` no Sort either, for sort-merge joins).

    Bucket count is a layout contract: pick once per subject area (e.g.
    32/64/128) — only co-bucketed tables elide the shuffle. Uses
    ``saveAsTable`` because bucket metadata lives in the catalog, not in
    the files.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (possibly bucketed) table back; bucket metadata is
    applied automatically by the planner."""
    return spark.table(table)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_cols: "list[str] | None" = None,
) -> int:
    """Small-files compaction — the maintenance job every streaming-fed
    lake table needs: micro-batch sinks and fine-grained partitioning
    leave thousands of tiny parquet files, and at 100 TB the resulting
    footer/task overhead dominates scan cost (a 1 KB file costs the same
    task setup as a 128 MB one). Rewrites the table at ``path`` into
    files of ~``target_file_mb`` (computed from the table's actual
    on-disk bytes, so the file count adapts to the data), preserving the
    directory-partitioning if ``partition_cols`` is given. Returns the
    number of output files written.

    The rewrite is staged next to the table and swapped in by two
    renames, so a reader never observes a HALF-compacted table — but the
    swap is not atomic: there is a brief window between the renames with
    no directory at the canonical path, and a crash inside it leaves the
    data at ``path + "__compact_old"``. Plain parquet cannot do better
    (POSIX has no directory exchange); table formats (Delta/Iceberg) are
    the production answer when readers must never miss. Leftover stage/
    old directories from a crashed prior run are cleaned up on entry, so
    a failed compaction never wedges the next one.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    stage_dir = path.rstrip("/") + "__compact_stage"
    old_dir = path.rstrip("/") + "__compact_old"
    for leftover in (stage_dir, old_dir):
        if _os.path.exists(leftover):
            if not _os.path.exists(path) and leftover == old_dir:
                # prior run crashed mid-swap: restore the table first
                _os.rename(old_dir, path)
            else:
                _shutil.rmtree(leftover, ignore_errors=True)

    files = _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    total_bytes = sum(_os.path.getsize(f) for f in files)
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    stage = stage_dir
    if partition_cols:
        # cluster rows by their partition value so every directory gets a
        # handful of full files instead of one sliver per shuffle task
        from pyspark.sql import functions as _F

        out = df.repartition(n_files, *[_F.col(c) for c in partition_cols])
        writer = out.write.mode("overwrite").partitionBy(*partition_cols)
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(stage)
    _os.rename(path, old_dir)
    _os.rename(stage, path)
    _shutil.rmtree(old_dir, ignore_errors=True)
    return len(
        _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    )
