"""Core relational operators (SURVEY.md §2.3/§2.4, P1-P4, F1-F9, J1, S2).

Every function is ``DataFrame -> DataFrame`` and purely declarative, so the
same transform runs in batch and inside a Structured Streaming query, and
Catalyst applies pushdown/pruning/broadcast automatically. The reference
expresses these as ksqlDB CSAS statements; here they are reusable plan
fragments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_kafka_ek_spark.functions.scalars import concat_strict


def split_by_pattern(
    df: DataFrame, col: str, pattern: str = "%test%"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint predicate partition of one stream — the reference's
    RATINGS_LIVE / RATINGS_TEST pair built from ``LCASE(col) [NOT] LIKE``
    (reference: ksqldb-statements.sql:13-17; README.md:122-126).

    Returns ``(live, test)``; ``live UNION test == df`` by construction
    (NULLs in ``col`` land in neither side, matching ksqlDB LIKE semantics
    where NULL LIKE ... is NULL — the fixture columns are non-null).
    """
    matches = F.lower(F.col(col)).like(pattern)
    return df.filter(~matches), df.filter(matches)


def latest_per_key(df: DataFrame, key: str | list[str], order_by: list[Column]) -> DataFrame:
    """Changelog -> table semantics: latest value per primary key
    (reference: ksqldb-statements.sql:42-43 — ``CREATE TABLE ... PRIMARY KEY``
    over a CDC topic; README.md:204-210 demonstrates updates superseding).

    Spark-native: ``row_number()`` over a per-key descending-recency window.
    At 100 TB this is one shuffle on the key; if the upstream is bucketed by
    the key the exchange is elided. ``order_by`` must be a total order
    (include a unique tiebreaker) for deterministic results.
    """
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def enrich_stream_with_table(
    stream: DataFrame,
    table: DataFrame,
    on: Column,
    how: str = "left",
    broadcast_table: bool = True,
) -> DataFrame:
    """The reference's single join: stream-table LEFT OUTER equi-join
    enriching each event with the current dimension row
    (reference: ksqldb-statements.sql:50-60; README.md:220-231).

    The dimension is broadcast by default — the reference's CUSTOMERS table
    is 20 rows (customers.sql:26-45) and real dimension tables stay MBs-GBs
    while the fact side is the 100 TB stream; broadcasting avoids shuffling
    the fact table entirely. Set ``broadcast_table=False`` for a
    dimension too large to broadcast (Catalyst then picks sort-merge and
    AQE can still convert back at runtime).
    """
    dim = F.broadcast(table) if broadcast_table else table
    return stream.join(dim, on, how)


def full_name(first: str = "first_name", last: str = "last_name") -> Column:
    """``FIRST_NAME + ' ' + LAST_NAME AS FULL_NAME``
    (reference: ksqldb-statements.sql:54) with NULL-propagating concat."""
    return concat_strict(F.col(first), F.lit(" "), F.col(last)).alias("full_name")


def top_k_terms(df: DataFrame, col: str, k: int = 5) -> DataFrame:
    """Kibana ``terms`` aggregation: top-k values by frequency
    (reference: docker-compose.yml:326-328 — size:5, order desc).

    Deterministic tiebreak on the term itself. groupBy+count is
    map-side-combined by Spark, so the shuffle carries one row per distinct
    term per partition — safe at any scale when cardinality is bounded.
    """
    return (
        df.groupBy(F.col(col).alias("term"))
        .agg(F.count(F.lit(1)).alias("term_count"))
        .orderBy(F.desc("term_count"), F.asc("term"))
        .limit(k)
    )


def funnel(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str = "7 days",
) -> DataFrame:
    """Ordered funnel / conversion analysis: how many users performed the
    ``steps`` event types in order, each strictly after the previous one
    and all inside ``within`` of their step-1 time. First-touch-anchor
    convention (standard in product analytics): conversion is measured
    relative to the user's FIRST step-1 event — that event fixes the
    ``t0 + within`` deadline. Given that anchor, taking the EARLIEST
    qualifying event at every LATER step is exact (it maximizes the time
    left for subsequent steps), so the greedy per-step ``min(ts)`` never
    under-counts past the anchor. Note a later step-1 event could open a
    later deadline under an "any-anchor" convention; we deliberately do
    not search alternate anchors, and the SQL oracle pins the same
    first-touch semantics.

    Returns one row per step: ``(step_idx, step, users)``.

    Scale shape: ONE scan (the isin(steps) predicate pushes to parquet —
    only funnel-relevant rows are read) and ONE user-keyed shuffle; the
    greedy chain is a fold (``F.aggregate``) over each user's time-sorted
    step events, entirely inside whole-stage codegen — no join per level,
    no recomputation per step count (the naive per-level join/count
    formulation re-scans the fact table per step: 12 scans for 3 steps in
    the measured plan). Per-user state is (level, t0, t_prev); the final
    per-step counts are one conditional aggregation over the per-user
    levels, stacked into rows map-side.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    interval = F.expr(f"INTERVAL {within}")
    step_arr = F.array(*[F.lit(s) for s in steps])
    n_steps = len(steps)
    per_user = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("u"),
            F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")).alias(
                "e"
            ),
        )
        .groupBy("u")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    init = F.struct(
        F.lit(0).alias("reached"),
        F.lit(None).cast("timestamp").alias("t0"),
        F.lit(None).cast("timestamp").alias("tp"),
    )

    def fold(acc, e):
        first = acc["reached"] == 0
        # least() keeps the index in bounds once the chain is complete
        # (ANSI mode errors on out-of-range element_at); the < n_steps
        # guard below makes the saturated lookup value irrelevant
        nxt = F.element_at(step_arr, F.least(acc["reached"] + 1, F.lit(n_steps)))
        ok_time = first | (
            (e["t"] > acc["tp"]) & (e["t"] <= acc["t0"] + interval)
        )
        advance = (
            (acc["reached"] < n_steps) & (e["y"] == nxt) & ok_time
        )
        return F.when(
            advance,
            F.struct(
                (acc["reached"] + 1).alias("reached"),
                F.when(first, e["t"]).otherwise(acc["t0"]).alias("t0"),
                e["t"].alias("tp"),
            ),
        ).otherwise(acc)

    levels = per_user.select(
        F.aggregate("evs", init, fold)["reached"].alias("reached")
    )
    one_row = levels.agg(
        *[
            F.coalesce(
                F.sum((F.col("reached") >= i + 1).cast("int")), F.lit(0)
            )
            .cast("long")
            .alias(f"__c{i}")
            for i in range(n_steps)
        ]
    )
    return one_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step_idx"),
                        F.lit(step).alias("step"),
                        F.col(f"__c{i}").alias("users"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.step_idx", "r.step", "r.users")


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based batch sessionization: split each user's event sequence
    wherever consecutive events are more than ``gap_s`` seconds apart, and
    return one summary row per session:
    ``(user, session_idx, session_start, session_end, n_events)``.
    This is the batch twin of the T4 ``session_window`` streaming
    aggregation — same 30-minute-gap semantics, but with stable per-user
    session indexes usable as join keys downstream.

    Scale shape: one shuffle on the user key for the ordering window; the
    boundary flag is a ``lag`` diff, the session index a running sum over
    the same window (no second exchange — same partitioning), and the
    final per-session groupBy re-uses the user-keyed partitioning again.
    Per-user state is one sort of that user's events — bounded by the
    per-user event count, never by the stream.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_break = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
        > gap_s
    )
    is_new = F.when(gap_break | F.lag(ts_col).over(w).isNull(), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("__new", is_new)
        .withColumn("session_idx", F.sum("__new").over(run))
        .groupBy(F.col(user_col), F.col("session_idx").cast("long").alias("session_idx"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def cohort_retention(
    events: DataFrame,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users are cohorted by the DAY of their first
    ``cohort_event``, and each later active day counts toward the
    week-offset bucket ``floor(days_since_cohort / 7)``. Returns
    ``(cohort_date, week_offset, active_users)`` — the classic retention
    triangle. Day-level cohorts + integer day arithmetic keep the math
    engine-identical (no week-truncation conventions to disagree on).

    Scale shape: SINGLE PASS — one scan and one user-keyed aggregation
    produce, per user, the cohort day (a conditional min) and the
    distinct active-day set (bounded by days-in-history, not events);
    offsets explode map-side from that set, and the only further
    shuffle is the slim (cohort_date, offset, user) dedup feeding the
    terminal rollup. No join, and nothing is keyed on a low-cardinality
    column until the final aggregate.
    """
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.min(
                F.when(F.col(type_col) == cohort_event, F.to_date(ts_col))
            ).alias("cohort_date"),
            F.collect_set(F.to_date(ts_col)).alias("__days"),
        )
        .filter(F.col("cohort_date").isNotNull())
    )
    return (
        per_user.select("u", "cohort_date", F.explode("__days").alias("d"))
        .withColumn(
            "week_offset",
            F.floor(F.datediff(F.col("d"), F.col("cohort_date")) / 7).cast("long"),
        )
        .filter(F.col("week_offset") >= 0)
        .select("cohort_date", "week_offset", "u")
        .distinct()
        .groupBy("cohort_date", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def max_drawdown(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Largest peak-to-trough drop of ``value_col`` per key over event
    time — the monitoring analytic behind "how far did this series fall
    from its high" alerts. ``drawdown(t) = running_max(value) - value``;
    the result is its per-key maximum.

    One key-partitioned ordering window (running max is computed in a
    single pass over each key's sorted rows — state is one number) and
    the per-key rollup reuses the same partitioning: one exchange total.
    ``tiebreak_col`` makes the running max deterministic under equal
    timestamps on every engine. Returns ``(key, max_drawdown)``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("__peak", F.max(value_col).over(w))
        .groupBy(key_col)
        .agg(
            F.round(F.max(F.col("__peak") - F.col(value_col)), 4).alias(
                "max_drawdown"
            )
        )
    )


def zscore_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 1.8,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group z-score outliers: events whose value deviates from their
    group's mean by at least ``threshold`` sample standard deviations —
    the statistical feed for the alerting sinks (the reference alerts on
    a fixed rating threshold; this is the adaptive version that needs no
    per-group tuning).

    Scale shape: group statistics are one map-side-combined aggregate
    over (group, partial moments) — a groups-sized result BROADCAST into
    the scoring join, so the fact stream is scanned once and never
    shuffled. Returns ``(id, group, value, zscore)``.
    """
    stats = (
        events.groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.avg(value_col).alias("__m"),
            F.stddev_samp(value_col).alias("__sd"),
        )
        # Zero-variance (constant-valued) groups have no outliers by
        # definition, and singleton groups have NULL stddev_samp; both
        # must be dropped BEFORE the scoring join or ANSI mode (Spark 4
        # default) raises DIVIDE_BY_ZERO on the quiet-constant-group
        # case.  The DuckDB oracle applies the same `sd > 0` guard.
        .filter(F.col("__sd") > 0)
    )
    z = (F.col(value_col) - F.col("__m")) / F.col("__sd")
    return (
        events.join(
            F.broadcast(stats), events[group_col] == F.col("__g")
        )
        .filter(F.abs(z) >= threshold)
        .select(
            id_col,
            group_col,
            value_col,
            F.round(z, 4).alias("zscore"),
        )
    )


def cascade_rollup(
    events: DataFrame,
    key: str,
    ts_col: str = "ts",
    resolutions_s: tuple[int, ...] = (60, 900, 3600),
) -> DataFrame:
    """Multi-resolution time rollup (the hypertable continuous-aggregate
    pattern): aggregate once at the finest resolution, then derive every
    coarser level by re-aggregating the finest level's partials — at
    100 TB that is ONE scan of the raw events plus re-aggregations over
    the (tiny) finest rollup, instead of one full scan per resolution.
    Resolutions must nest (each must divide the next) so window starts
    align exactly.

    Returns the union of all levels tagged with ``resolution_s``, with
    mergeable partials (count + sum) so downstream can keep cascading.
    """
    for fine, coarse in zip(resolutions_s, resolutions_s[1:]):
        if coarse % fine != 0:
            raise ValueError(f"resolutions must nest: {coarse} % {fine} != 0")
    finest = resolutions_s[0]
    base = (
        events.groupBy(
            (F.floor(F.unix_timestamp(ts_col) / finest) * finest)
            .cast("long")
            .alias("bucket"),
            F.col(key),
        )
        .agg(F.count(F.lit(1)).alias("event_count"), F.sum("value").alias("value_sum"))
    )
    levels = [
        base.select(
            F.lit(finest).alias("resolution_s"), "bucket", key, "event_count", "value_sum"
        )
    ]
    prev = base.withColumn("res", F.lit(finest))
    for res in resolutions_s[1:]:
        prev = (
            prev.groupBy(
                (F.floor(F.col("bucket") / res) * res).cast("long").alias("bucket"),
                F.col(key),
            )
            .agg(F.sum("event_count").alias("event_count"), F.sum("value_sum").alias("value_sum"))
        )
        levels.append(
            prev.select(
                F.lit(res).alias("resolution_s"), "bucket", key, "event_count", "value_sum"
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "resolution_s",
        F.date_format(F.timestamp_seconds("bucket"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        key,
        "event_count",
        F.round("value_sum", 4).alias("value_sum"),
    )


def distribution_drift(
    baseline: DataFrame,
    current: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 10,
    threshold: float = 0.2,
) -> DataFrame:
    """Population-Stability-Index drift detection per group: histogram the
    CURRENT window's values against bins fixed by the BASELINE window's
    per-group [min, max] and report ``PSI = sum (p_i - q_i) ln(p_i/q_i)``
    with add-one smoothing — the standard monitoring number for "has this
    feed's distribution moved" (PSI > 0.2 is the conventional
    investigate threshold, surfaced as the ``drifted`` flag). This is
    the distribution-level companion to ``zscore_outliers``' row-level
    alerts and feeds the same alert sinks.

    Groups absent from the baseline are dropped (no reference
    distribution to compare against); current values outside the
    baseline range clamp into the edge bins, so range expansion shows up
    as edge-bin mass, not as lost rows. A ZERO-WIDTH baseline (hi == lo,
    a constant feed) bins on equality instead: value == lo -> bin 0,
    anything else -> the top edge bin — so a constant feed that moves to
    a different constant (or spreads out) still registers drift rather
    than silently mapping everything to bin 0 and reporting PSI = 0.

    Determinism: integer bin counts, rational smoothed frequencies, one
    ln per bin and a <= n_bins-term sum rounded to 4dp (the engine-
    divergence budget every aggregate here uses).

    Scale shape: per-group bounds are a map-side-combined aggregate
    BROADCAST into both histogram passes; each pass is one
    groupBy(group, bin) of counter rows (map-side combined); the PSI
    fold runs over <= groups*n_bins slim rows. Neither raw scan
    shuffles fact rows — the 100 TB monitoring-query shape.

    Returns ``(grp, n_baseline, n_current, psi, drifted)``.
    """
    bounds = baseline.groupBy(F.col(group_col).alias("grp")).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )

    def hist(df: DataFrame, out: str) -> DataFrame:
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        b = (
            F.when(
                F.col("__hi") == F.col("__lo"),
                # degenerate baseline: bin on equality so a moved
                # constant lands in the edge bin, not silently in bin 0
                F.when(F.col(value_col) == F.col("__lo"), F.lit(0)).otherwise(
                    F.lit(n_bins - 1)
                ),
            )
            .otherwise(
                F.least(
                    F.greatest(
                        F.floor((F.col(value_col) - F.col("__lo")) / width),
                        F.lit(0),
                    ),
                    F.lit(n_bins - 1),
                )
            )
            .cast("int")
        )
        return (
            df.select(F.col(group_col).alias("grp"), F.col(value_col))
            .join(F.broadcast(bounds), "grp")
            .select("grp", b.alias("bin"))
            .groupBy("grp", "bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    hb = hist(baseline, "cb")
    hc = hist(current, "cc")
    grid = bounds.select(
        "grp", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    cells = (
        grid.join(hb, ["grp", "bin"], "left")
        .join(hc, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            F.coalesce("cb", F.lit(0)).alias("cb"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    w = Window.partitionBy("grp")
    nb = F.sum("cb").over(w)
    nc = F.sum("cc").over(w)
    p = (F.col("cb") + 1) / (nb + F.lit(n_bins))
    q = (F.col("cc") + 1) / (nc + F.lit(n_bins))
    term = (p - q) * F.log(p / q)
    out = (
        cells.select("grp", nb.alias("n_baseline"), nc.alias("n_current"), term.alias("__t"))
        .groupBy("grp", "n_baseline", "n_current")
        .agg(F.round(F.sum("__t"), 4).alias("psi"))
    )
    return (
        out.filter(F.col("n_current") > 0)
        .select(
            "grp",
            F.col("n_baseline").cast("long").alias("n_baseline"),
            F.col("n_current").cast("long").alias("n_current"),
            "psi",
            (F.col("psi") > F.lit(threshold)).alias("drifted"),
        )
    )
