"""Environment-drift tripwire (VERDICT r4 ask #3).

Round 4 was killed by a silent environment change: the verify rig moved to
pyspark 4.x, where the removed conf ``spark.sql.legacy.parquet.nanosAsLong``
is ignored and ``events.ts`` arrives as TIMESTAMP_NTZ instead of long ns —
every events-touching query threw at analysis time, but nothing in the test
suite checked the loaded fixture schemas directly, so the failure surfaced
only in the driver's verify.

These tests fail loudly and CHEAPLY (analysis only, no execution) if the
runtime's parquet reader semantics drift again:

* every fixture table loads and has the expected columns;
* ``events.ts`` is a true TIMESTAMP after normalization;
* every registered ``queries()`` entry ANALYZES — ``.schema`` forces full
  Catalyst analysis without running a job, so this sweeps all ~84 queries
  in seconds and catches any version-specific expression breakage.
"""

import pytest
from pyspark.sql.types import TimestampType

from data_pipeline_kafka_ek_spark.sources.tables import TABLES, load_table

EXPECTED_KEY_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("name", TABLES)
def test_fixture_table_loads_with_expected_columns(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    missing = EXPECTED_KEY_COLUMNS[name] - set(df.columns)
    assert not missing, f"{name} lost columns {missing}; schema drift?"


def test_events_ts_is_timestamp_after_normalization(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, TimestampType), (
        f"events.ts normalized to {ts_type}, not TIMESTAMP — the parquet "
        "reader semantics changed (this is the exact failure that nuked "
        "round 4); update sources/tables.py:normalize_events_ts"
    )


@pytest.mark.slow
def test_every_registered_query_analyzes(spark, sf_dir):
    """.schema forces Catalyst analysis (resolution + type checking) for
    every registered query without executing a single job — milliseconds
    per query. A DATATYPE_MISMATCH anywhere in the catalog fails here at
    the first pytest run instead of in the driver's verify."""
    import __spark_entry__ as entry

    failures = {}
    for qname, fn in entry.queries().items():
        try:
            fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001 - collect all, report once
            failures[qname] = f"{type(exc).__name__}: {str(exc)[:200]}"
    assert not failures, f"{len(failures)} queries fail analysis: {failures}"
