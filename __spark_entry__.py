"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``data_pipeline_kafka_ek_spark.plans.catalog`` — the engine's
central query registry (one entry per SURVEY.md §2 operator, plus the
large-scale extension operators). The driver's verify runs ``entry(spark)``
as a smoke check and compares each ``queries()[name]`` against
``oracle_sql()[name]`` via DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_kafka_ek_spark.plans import catalog
from data_pipeline_kafka_ek_spark.plans import extensions as _extensions  # noqa: F401  (registers extension queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (UNHAPPY_PLATINUM_CUSTOMERS twin, SURVEY.md §7.1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["unhappy_vip_customers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys are non-SQL-expressible ops
    (the driver records a weaker rows-only check for those)."""
    return catalog.oracle_sql()
