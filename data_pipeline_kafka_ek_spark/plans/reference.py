"""The reference's flagship derivations, rebuilt on the fixture tables.

Reference lineage (ksqldb-statements.sql:13-17, 50-60, 63-68, 88-93):

    ratings --(LCASE LIKE split)--> RATINGS_LIVE / RATINGS_TEST
    RATINGS_LIVE x CUSTOMERS --(left equi-join + IS NOT NULL)-->
        RATINGS_WITH_CUSTOMER_DATA
    ... --(stars<3 AND club_status='platinum')--> UNHAPPY_PLATINUM_CUSTOMERS
    ... --(WINDOW TUMBLING 15 MIN, COLLECT_LIST)--> RATINGS_PER_CUSTOMER_PER_15MIN

Fixture mapping (FIXTURES.md §C): ``events`` plays the ratings stream
(ts=ROWTIME, user_id=USER_ID, value=STARS, event_type=CHANNEL) and
``customer`` plays the CUSTOMERS dimension (c_custkey=ID, c_name≈name,
c_mktsegment≈CLUB_STATUS). The 'test' channel marker becomes the 'err'
substring of event_type; 'platinum' becomes mktsegment 'BUILDING'.

Each function is a pure DataFrame transform reused verbatim by the
streaming runtime (streaming/runtime.py) — batch/stream parity by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.functions.scalars import concat_strict
from data_pipeline_kafka_ek_spark.operators.relational import (
    enrich_stream_with_table,
    split_by_pattern,
)

# the LIVE/TEST split marker (reference: '%test%' on CHANNEL)
LIVE_PATTERN = "%err%"
# the alert predicate (reference: STARS < 3 AND CLUB_STATUS = 'platinum')
UNHAPPY_VALUE_THRESHOLD = 50.0
VIP_SEGMENT = "BUILDING"


def events_live(events: DataFrame) -> DataFrame:
    """RATINGS_LIVE twin: drop 'test'-like traffic
    (reference: ksqldb-statements.sql:13-14)."""
    live, _ = split_by_pattern(events, "event_type", LIVE_PATTERN)
    return live


def events_test(events: DataFrame) -> DataFrame:
    """RATINGS_TEST twin (reference: ksqldb-statements.sql:16-17)."""
    _, test = split_by_pattern(events, "event_type", LIVE_PATTERN)
    return test


def enriched_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """RATINGS_WITH_CUSTOMER_DATA twin
    (reference: ksqldb-statements.sql:50-60).

    Stream-table left equi-join on the casted key, post-join NOT NULL
    filter (making it effectively inner), computed label column via
    NULL-propagating concat. The dimension side is broadcast — at 100 TB
    the fact stream never shuffles for this join.
    """
    live = events_live(events)
    joined = enrich_stream_with_table(
        live,
        customer,
        on=live["user_id"].cast("long") == customer["c_custkey"],
        how="left",
    )
    return (
        joined.filter(F.col("c_name").isNotNull())
        .select(
            F.col("event_id"),
            F.col("ts"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("c_name"),
            F.col("c_mktsegment"),
            concat_strict(F.col("c_name"), F.lit(" "), F.col("c_mktsegment")).alias(
                "customer_label"
            ),
        )
    )


def unhappy_vip_customers(events: DataFrame, customer: DataFrame) -> DataFrame:
    """UNHAPPY_PLATINUM_CUSTOMERS twin
    (reference: ksqldb-statements.sql:63-68): low score AND VIP segment,
    conjunctive filter over the enriched stream."""
    return enriched_events(events, customer).filter(
        (F.col("value") < UNHAPPY_VALUE_THRESHOLD)
        & (F.col("c_mktsegment") == VIP_SEGMENT)
    )


def events_per_customer_per_15min(events: DataFrame, customer: DataFrame) -> DataFrame:
    """RATINGS_PER_CUSTOMER_PER_15MINUTE twin
    (reference: ksqldb-statements.sql:88-93): tumbling 15-minute window per
    customer label, COUNT + COLLECT_LIST.

    The collected list is sorted so results are deterministic regardless of
    partitioning (ksqlDB's COLLECT_LIST is arrival-ordered, which is not
    reproducible — SURVEY.md §5.2 layer 1 requires order-insensitivity), and
    serialized to a comma-joined string: harness canonicalizers (pandas
    sort/factorize) can't hash raw ARRAY cells, and a flat string is also the
    wire shape a sink (ES/Kafka) would carry. Sort happens in the int64
    domain BEFORE the cast to string so ordering matches SQL engines'
    numeric list_sort ("10" < "2" lexically but not numerically).
    """
    enriched = enriched_events(events, customer)
    return (
        enriched.groupBy(
            F.window("ts", "15 minutes").alias("w"),
            F.col("customer_label"),
        )
        .agg(
            F.count(F.lit(1)).alias("rating_count"),
            F.sort_array(F.collect_list("event_id")).alias("__ids"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col("customer_label"),
            F.col("rating_count"),
            F.array_join(
                F.transform(F.col("__ids"), lambda x: x.cast("string")), ","
            ).alias("event_ids"),
        )
    )
