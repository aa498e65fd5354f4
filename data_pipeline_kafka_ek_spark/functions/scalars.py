"""Scalar function surface (SURVEY.md §2.9, X1-X11).

Everything the reference's queries call is a ksqlDB built-in; each maps to a
``pyspark.sql.functions`` built-in (JVM-side, whole-stage-codegen'd). These
wrappers exist to pin down the exact semantics the reference relies on —
especially NULL behavior — not to add execution machinery.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def concat_strict(*cols: Column | str) -> Column:
    """String concatenation with ksqlDB ``+`` semantics: NULL in -> NULL out.

    The reference builds FULL_NAME as ``FIRST_NAME + ' ' + LAST_NAME``
    (reference: ksqldb-statements.sql:54). Spark's ``concat`` matches that
    NULL contract; ``concat_ws`` would silently skip NULLs (SURVEY.md §7.3).
    """
    return F.concat(*[F.col(c) if isinstance(c, str) else c for c in cols])


def timestamp_to_string(ts: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """ksqlDB ``TIMESTAMPTOSTRING(ROWTIME, fmt)`` twin
    (reference: README.md:238, ksqldb-statements.sql:96,104).

    ksqlDB takes epoch-millis; the fixtures carry real timestamps, so this
    accepts a TimestampType column directly. Same Java time pattern letters.
    """
    return F.date_format(ts, fmt)


def epoch_millis_to_string(epoch_ms: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Exact-signature twin for BIGINT epoch-millis inputs (ROWTIME)."""
    col = F.col(epoch_ms) if isinstance(epoch_ms, str) else epoch_ms
    return F.date_format(F.timestamp_millis(col), fmt)


def json_get(col: Column | str, field: str) -> Column:
    """Consumer-side ``json.loads(msg.value())[field]`` twin
    (reference: ios_push_notifications/python_kafka_notify.py:37-39) —
    JVM-side JSON path extraction instead of per-row Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}")


def register_sql_functions(spark) -> "list[str]":
    """Expose the ksqlDB-named scalar surface to plain ``spark.sql``
    users as SQL-body functions (``CREATE TEMPORARY FUNCTION ... RETURN
    <expr>``): a user of the reference can paste ``TIMESTAMPTOSTRING``
    / ``EXTRACTJSONFIELD`` / ``CONCAT_STRICT`` calls into Spark SQL
    unchanged. These are Catalyst expression macros, NOT Python UDFs —
    the plan stays in whole-stage codegen with no Python in it (asserted
    in tests), so the SQL spelling costs nothing over the DataFrame
    twins in this module. Returns the registered names.

    Reference parity: TIMESTAMPTOSTRING (README.md:238),
    EXTRACTJSONFIELD, and the NULL-propagating ``+`` concat
    (ksqldb-statements.sql:54) as CONCAT_STRICT. LCASE/UCASE
    (ksqldb-statements.sql:14,17) need no registration at all — they are
    Spark SQL built-ins with identical semantics (attempting to shadow a
    built-in with a SQL UDF is an AnalysisException).
    """
    stmts = {
        "TIMESTAMPTOSTRING": (
            "CREATE OR REPLACE TEMPORARY FUNCTION TIMESTAMPTOSTRING"
            "(t TIMESTAMP, fmt STRING) RETURNS STRING "
            "RETURN date_format(t, fmt)"
        ),
        "EPOCHMILLISTOSTRING": (
            "CREATE OR REPLACE TEMPORARY FUNCTION EPOCHMILLISTOSTRING"
            "(ms BIGINT, fmt STRING) RETURNS STRING "
            "RETURN date_format(timestamp_millis(ms), fmt)"
        ),
        "EXTRACTJSONFIELD": (
            "CREATE OR REPLACE TEMPORARY FUNCTION EXTRACTJSONFIELD"
            "(j STRING, path STRING) RETURNS STRING "
            "RETURN get_json_object(j, path)"
        ),
        "CONCAT_STRICT": (
            "CREATE OR REPLACE TEMPORARY FUNCTION CONCAT_STRICT"
            "(a STRING, b STRING) RETURNS STRING "
            "RETURN CASE WHEN a IS NULL OR b IS NULL THEN NULL "
            "ELSE concat(a, b) END"
        ),
    }
    for stmt in stmts.values():
        spark.sql(stmt)
    return sorted(stmts)
