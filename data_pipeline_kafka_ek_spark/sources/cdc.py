"""CDC source adapter (S5): keep a dimension table current from a change
stream — the reference's Debezium MySQL -> Kafka -> ksqlDB TABLE path
(reference: ksqldb-statements.sql:19-38; README.md:156-176).

Spark has no native CDC source; the two supported routes (SURVEY.md §2.1
S5) are:

* consume a Debezium-format change topic: unwrap the ``before``/``after``
  envelope (the reference does this with the ``ExtractNewRecordState`` SMT,
  X10) and apply latest-per-key;
* periodic JDBC snapshot (``spark.read.jdbc``) + the same apply step.

The *apply* step is the part that matters and is fully implemented/tested:
an idempotent MERGE-shaped upsert that maintains a materialized
latest-per-key table across micro-batches (the reference's live
UPDATE-propagation experiment, README.md:204-210). Without Delta Lake in
this container the materialization is compact parquet rewrite — the
interface is MERGE semantics either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.operators.relational import latest_per_key


def unwrap_debezium(changes: DataFrame, key: str = "id") -> DataFrame:
    """``ExtractNewRecordState`` SMT twin (X10, reference:
    ksqldb-statements.sql:31-32): keep the after-image plus op/ts metadata;
    deletes (op='d') have NULL ``after``, so the key falls back to the
    before-image and ``__deleted`` marks the row for the apply step."""
    value_cols = [c for c in changes.select("after.*").columns if c != key]
    return changes.select(
        F.coalesce(F.col(f"after.{key}"), F.col(f"before.{key}")).alias(key),
        *[F.col(f"after.{c}").alias(c) for c in value_cols],
        F.col("op"),
        F.col("ts_ms"),
        (F.col("op") == "d").alias("__deleted"),
    )


def apply_changes(
    current: DataFrame | None,
    changes: DataFrame,
    key: str,
    order_by: list[Column],
) -> DataFrame:
    """MERGE: union the existing table state with the new change rows and
    keep the newest version per key — upserts and re-deliveries (at-least-
    once) are both idempotent. Deletes are rows with ``__deleted`` true and
    are dropped after the merge."""
    merged = changes if current is None else current.unionByName(
        changes, allowMissingColumns=True
    )
    latest = latest_per_key(merged, key, order_by)
    if "__deleted" in latest.columns:
        latest = latest.filter(
            (F.col("__deleted").isNull()) | (~F.col("__deleted"))
        )
    return latest


class MaterializedTable:
    """A continuously-maintained latest-per-key table (the ksqlDB TABLE
    abstraction, S2) backed by parquet: ``apply_batch`` is the foreachBatch
    target for a change stream; ``read`` serves the current state to
    stream-static enrichment joins (J1) — Spark re-reads the static side
    every micro-batch, matching ksqlDB's current-table-state join
    semantics (SURVEY.md §7.3).

    Scale shape: the table is laid out in ``n_buckets`` hash-bucket
    partitions on the key, and a micro-batch rewrites ONLY the buckets its
    change keys hash into (dynamic partition overwrite) — merge cost is
    proportional to the touched fraction of the table, not its size (the
    incremental-MERGE pattern). For the full ACID form — atomic commit
    log, optimistic concurrency, snapshot isolation / time travel and an
    exactly-once foreachBatch MERGE — use ``sources/acid.py::TxnLogTable``,
    this class's transaction-log sibling (same latest-per-key semantics,
    proven equivalent in tests/test_acid.py)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        order_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.order_col = order_col
        self.n_buckets = n_buckets

    def _fs_path(self, path: str):
        """(FileSystem, Path) through the Hadoop FS API, so the same class
        works against local paths, ``file:/`` URIs, HDFS, and (given the
        connector jars) any object store — never POSIX os/shutil calls."""
        jpath = self.spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def exists(self) -> bool:
        # dynamic-partition-overwrite commits don't write a root _SUCCESS
        # marker — presence of any bucket partition directory is the signal
        fs, root = self._fs_path(self.path)
        if not fs.exists(root) or not fs.getFileStatus(root).isDirectory():
            return False
        return any(
            st.getPath().getName().startswith("__bucket=")
            for st in fs.listStatus(root)
        )

    def _bucket(self) -> Column:
        return F.pmod(F.hash(self.key), F.lit(self.n_buckets)).cast("int")

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop("__bucket")

    def apply_batch(self, changes: DataFrame, batch_id: int | None = None) -> None:
        changes = changes.localCheckpoint(eager=True)
        touched = [
            r[0] for r in changes.select(self._bucket().alias("b")).distinct().collect()
        ]
        current = None
        if self.exists():
            # partition pruning: only the touched buckets are read
            current = (
                self.spark.read.parquet(self.path)
                .filter(F.col("__bucket").isin(touched))
                .drop("__bucket")
            )
        updated = apply_changes(current, changes, self.key, [F.desc(self.order_col)])
        out = updated.withColumn("__bucket", self._bucket())
        # write-then-swap via localCheckpoint: materialize the merge result
        # before overwriting the partitions it reads from; dynamic mode
        # rewrites only the partitions present in the output
        out = out.localCheckpoint(eager=True)
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(conf_key, "STATIC")
        self.spark.conf.set(conf_key, "dynamic")
        try:
            out.write.partitionBy("__bucket").mode("overwrite").parquet(self.path)
        finally:
            self.spark.conf.set(conf_key, prev)
        # a bucket whose keys were all deleted produces no output partition,
        # which dynamic overwrite leaves stale — clear it explicitly
        remaining = {r[0] for r in out.select("__bucket").distinct().collect()}
        for b in set(touched) - remaining:
            fs, bucket_dir = self._fs_path(f"{self.path}/__bucket={b}")
            if fs.exists(bucket_dir):
                fs.delete(bucket_dir, True)  # recursive


def jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Periodic-snapshot CDC fallback (``spark.read.jdbc``); needs a JDBC
    driver jar + reachable database (neither in this container)."""
    return spark.read.jdbc(url, table, properties=properties or {})
