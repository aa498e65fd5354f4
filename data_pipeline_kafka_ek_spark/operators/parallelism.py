"""Partition-count discipline for compute-dense stages.

Two failure modes this module guards against (both observed on the bench
rig, both worse at scale):

1. **AQE byte-based coalescing vs CPU-bound stages.** AQE sizes
   post-shuffle partitions by *bytes*. Candidate-pair verification in the
   near-dup operators carries slim rows (two ids) but does quadratic-ish
   CPU work per row (set intersection, cosine), so AQE happily coalesces
   a 100-second compute stage into one task. ``spread`` pins an explicit
   partition count — Spark never coalesces a user-specified
   ``repartition(n, col)`` — keyed by a real column so the work also
   balances.

2. **Single-file scans feeding narrow compute.** A small parquet file is
   one input split; a narrow pipeline over it (e.g. a broadcast cross
   join) inherits the single partition and serializes. ``spread_if_narrow``
   repartitions only when the scan's partition count is below the
   session's parallelism — on a real cluster (thousands of input splits)
   it is a no-op, so the operators stay scale-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def _target(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def spread(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Explicitly repartition to the session's parallelism, keyed by
    ``cols`` — for stages whose cost is CPU per row, not bytes."""
    return df.repartition(_target(df), *cols) if cols else df.repartition(_target(df))


def _conf_bytes(spark, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ("134217728b", "128m",
    "1.5g") to bytes with SPARK'S OWN parser (Utils.byteStringAsBytes —
    a hand-rolled parser mis-read fractional sizes Spark itself
    accepts); fall back to ``default`` when unset or unparsable."""
    raw = spark.conf.get(key, None)
    if raw is None:
        return default
    try:
        jvm = spark.sparkContext._jvm
        return int(jvm.org.apache.spark.util.Utils.byteStringAsBytes(str(raw)))
    except Exception:
        return default


# Logical node names whose physical translation carries (or follows) an
# exchange: a frame containing any of these is NOT scan-rooted, so its
# partitioning already came from spark.sql.shuffle.partitions and a
# further repartition would be a redundant shuffle. Intersect/Except are
# the set-op spellings (both plan to shuffling joins/aggregates);
# Distinct analyzes to Deduplicate. Expand (rollup/cube) and Generate
# (explode) are deliberately absent: both are narrow — Expand only ever
# appears UNDER an Aggregate (which matches first), and an
# explode-over-small-scan frame genuinely inherits the scan's split
# count, i.e. exactly the narrow case this helper exists to spread.
_EXCHANGE_BEARING_NODES = frozenset({
    "Aggregate", "Join", "Window", "Sort", "Repartition",
    "RepartitionByExpression", "RepartitionOperation", "Deduplicate",
    "GlobalLimit", "Intersect", "Except",
})


def _has_exchange_bearing_node(df: DataFrame) -> bool:
    """Walk the ANALYZED logical plan tree via the JVM node objects
    (``nodeName`` per node — Catalyst derives it from the node class, so
    this is robust to text-format layout changes, unlike parsing
    ``toString()`` line prefixes) and report whether any node implies an
    exchange. No physical planning, no job. Falls back to the
    line-prefix sniff only if the JVM walk itself fails — and that
    fallback answers True (pass through / don't repartition), the
    conservative direction: a missed spread costs serial compute on a
    small scan, a wrong spread costs a redundant shuffle at scale."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if str(node.nodeName()) in _EXCHANGE_BEARING_NODES:
                return True
            children = node.children()
            for i in range(children.length()):
                stack.append(children.apply(i))
        return False
    except Exception:
        # A systematic walk failure (Spark Connect session, py4j API
        # drift) would silently turn spread_if_narrow into a permanent
        # no-op — make that visible once per process instead of never
        # (r15 ADVICE). Still answer True: pass-through stays the
        # conservative direction.
        global _WALK_FAILURE_WARNED
        if not _WALK_FAILURE_WARNED:
            _WALK_FAILURE_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "JVM logical-plan walk failed; spread_if_narrow is "
                "passing frames through unspread (narrow scans may run "
                "serial). This warning prints once per process.",
                exc_info=True,
            )
        return True


_WALK_FAILURE_WARNED = False


def spread_if_narrow(df: DataFrame, max_n: "int | None" = None) -> DataFrame:
    """Repartition a (scan-rooted) DataFrame only if its scan would open
    with fewer input splits than the session's parallelism.

    ``max_n`` caps the spread width for Python-boundary stages whose
    per-task fixed cost (worker dispatch, Arrow setup) needs amortizing
    over enough rows (guide §4.2/§4.5): measured on the pixel-decode
    path at 32 cores, width 8 beats width 32 by ~35% and serial by ~2x —
    the cap is the caller's dispatch-amortization knob, the narrowness
    TEST is unchanged (cluster-scale inputs still pass through).

    The split count is ESTIMATED from driver-side file metadata
    (``inputFiles()`` + one FileSystem stat per file, only taken when
    the file count is already below parallelism) using Spark's own
    split-sizing formula — never by materializing the plan
    (``df.rdd.getNumPartitions`` forced a full analysis pass per call
    and pinned the plan to a non-AQE RDD conversion; r13 verdict #9).
    Cluster-scale inputs (file count >= parallelism, or one file large
    enough to split into >= parallelism pieces) pass through untouched;
    non-file-rooted frames (in-memory, checkpointed, post-exchange) also
    pass through — their partitioning already came from
    ``defaultParallelism`` / ``spark.sql.shuffle.partitions`` at
    creation, so the single-split hazard this guards against cannot
    arise there."""
    n = _target(df)
    if max_n is not None:
        n = max(2, min(n, max_n))
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= n:
        return df
    # scan-rooted only: inputFiles() reports leaf files for the WHOLE
    # lineage, so a post-shuffle frame (aggregate, join, window, sort,
    # repartition, set op, distinct) over a small scan would be
    # misclassified as narrow and pay a redundant exchange — its
    # partitioning already came from spark.sql.shuffle.partitions.
    if _has_exchange_bearing_node(df):
        return df
    spark = df.sparkSession
    try:
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        jpath = sc._jvm.org.apache.hadoop.fs.Path
        total = 0
        for f in files:
            p = jpath(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    except Exception:
        # metadata unavailable (exotic FS): a sub-parallelism file count
        # of unknowable size is exactly the narrow case — spread it
        return df.repartition(n)
    mpb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 134217728)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4194304)
    padded = total + len(files) * open_cost
    max_split = min(mpb, max(open_cost, padded // n or 1))
    est_splits = max(1, -(-padded // max_split))
    return df.repartition(n) if est_splits < n else df
