"""Batch table source: the driver-materialized parquet fixtures.

The reference registers Kafka topics as streams/tables
(reference: README.md:99, ksqldb-statements.sql:42-45); the batch twin here
is a parquet scan per table. Reads are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning for free — at 100 TB the
same call reads a partitioned parquet/Delta lake and partition pruning
applies as well.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the fixture star schema + event stream + extension tables (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimensions small enough to broadcast at any realistic scale factor
BROADCAST_TABLES = frozenset({"region", "nation"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # runtime-set (not only in get_spark): the driver contract passes us an
    # externally-built SparkSession that won't have this legacy conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — Spark reads it as long
        # nanos (spark.sql.legacy.parquet.nanosAsLong); truncate to µs.
        # Integer division, NOT float: ns epoch ~1.7e18 exceeds double's
        # 53-bit exact-integer range.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so ``spark.sql`` is a first-class
    entry point (the reference's primary entry point is SQL text —
    SURVEY.md §3.1)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
