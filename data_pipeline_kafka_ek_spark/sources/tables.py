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
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
    try:
        # Spark 3.x reads parquet TIMESTAMP(NANOS) as long nanos only under
        # this conf; Spark 4.x removed it (setting it is a no-op there, and
        # some builds reject unknown legacy confs — hence the try).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP regardless of Spark major version.

    events.ts is parquet TIMESTAMP(NANOS). What Spark hands us depends on
    the runtime, so branch on the OBSERVED dtype:

    * Spark 3.x + ``nanosAsLong`` → long ns epoch; truncate to µs with
      integer division (NOT float: ns epoch ~1.7e18 exceeds double's
      53-bit exact-integer range).
    * Spark 4.x → TIMESTAMP_NTZ (ns already truncated to µs by the
      reader); session TZ is pinned to UTC, so the NTZ→LTZ cast is
      value-preserving and bit-identical to the 3.x path.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    if isinstance(ts_type, TimestampType):
        return df
    raise TypeError(
        f"events.ts arrived as {ts_type}; expected long ns, TIMESTAMP_NTZ, "
        "or TIMESTAMP — parquet reader semantics changed again?"
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so ``spark.sql`` is a first-class
    entry point (the reference's primary entry point is SQL text —
    SURVEY.md §3.1)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
