"""Every catalog query vs its DuckDB oracle at sf0.001 (fast twin of the
driver's sf0.01 correctness gate). Mirrors the driver's comparison: row
count + sorted column names + order-insensitive value hash."""

import duckdb
import pytest

import data_pipeline_kafka_ek_spark.plans.extensions  # noqa: F401  (registers extension queries before parametrize lists are built)
from data_pipeline_kafka_ek_spark.plans.catalog import QUERIES
from data_pipeline_kafka_ek_spark.sources.tables import TABLES
from tests.conftest import SF_DIR
from tools.check_correctness import value_hash


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY_QUERIES = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(spec.oracle)
    ocols = list(rel.columns)
    orows = rel.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: rowcount mismatch"
    assert value_hash(list(sdf.columns), srows) == value_hash(ocols, orows), (
        f"{name}: value hash mismatch"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_every_query_key_has_matching_oracle_key():
    import __spark_entry__ as em

    qs, os_ = em.queries(), em.oracle_sql()
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", list(QUERIES))
def test_no_complex_types_in_output_schema(spark, sf_dir, name):
    """The driver canonicalizes results via pandas sort_values, which cannot
    factorize list/dict cells (r01: a2_a3_windowed_collect red with
    'unhashable type: list'). Every catalog output column must therefore be
    an atomic type — arrays/maps/structs get serialized (array_join etc.)
    before leaving the query."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name].fn(spark, sf_dir).schema
    bad = [
        f.name for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: complex-typed output columns {bad}"
