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


def spread_if_narrow(df: DataFrame) -> DataFrame:
    """Repartition a (scan-rooted) DataFrame only if it has fewer
    partitions than the session's parallelism. Accurate for file scans
    (their partitioning is fixed at planning); cluster-scale inputs with
    many splits pass through untouched."""
    n = _target(df)
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df
