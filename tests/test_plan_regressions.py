"""Physical-plan regression guards: the headline queries' scale
properties (broadcast joins, pushdown, bounded shuffle counts, no
accidental row-Python) are asserted so a future refactor can't silently
trade them away. Counts are upper bounds — fewer is always fine."""

import re

import pytest

import __spark_entry__ as em


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def _shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange", plan)) - len(
        re.findall(r"BroadcastExchange", plan)
    )


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = em.queries()
    return {name: _plan(qs[name](spark, sf_dir)) for name in [
        "j1_enrichment_join",
        "unhappy_vip_customers",
        "h1_pricing_summary",
        "h3_top_revenue_orders",
        "h5_nation_revenue",
        "a2_a3_windowed_collect",
        "p1_project_columns",
    ]}


def test_enrichment_join_broadcasts_and_never_shuffles(plans):
    for q in ("j1_enrichment_join", "unhappy_vip_customers"):
        assert "BroadcastHashJoin" in plans[q]
        assert _shuffles(plans[q]) == 0, plans[q]


def test_flagship_filters_reach_the_scan(plans):
    p = plans["unhappy_vip_customers"]
    pushed = "".join(re.findall(r"PushedFilters: \[[^\]]*\]", p))
    assert "LessThan(value,50.0)" in pushed
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed


def test_projection_prunes_columns(plans):
    # p1 selects 4 of events' 6 columns; the scan schema must not widen
    m = re.search(r"ReadSchema: struct<([^>]*)>", plans["p1_project_columns"])
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "ts" not in cols and "event_id" not in cols


def test_aggregates_shuffle_at_most_once_per_grouping(plans):
    assert _shuffles(plans["h1_pricing_summary"]) <= 1
    assert _shuffles(plans["a2_a3_windowed_collect"]) <= 1
    # h3: one shuffle for the groupBy; top-k must be TakeOrdered, not sort
    assert _shuffles(plans["h3_top_revenue_orders"]) <= 1
    assert "TakeOrdered" in plans["h3_top_revenue_orders"]
    # h5: fact shuffles once, every dimension broadcasts
    assert _shuffles(plans["h5_nation_revenue"]) <= 1
    assert plans["h5_nation_revenue"].count("BroadcastHashJoin") >= 3


@pytest.mark.slow
def test_no_row_at_a_time_python_anywhere(spark, sf_dir):
    """Arrow-batched Python (ArrowEvalPython/MapInPandas) is allowed on
    the designated slow paths; row-at-a-time BatchEvalPython is banned
    engine-wide."""
    for name, fn in em.queries().items():
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} uses row-Python:\n{plan}"


def test_driver_window_rotation_invariants():
    """The verification driver samples the FIRST 50 entries of queries().
    Rotation policy (catalog.py): least-recently-driver-attested queries go
    first. Invariants, all checked against GROUND TRUTH (the committed
    CORRECTNESS_r*.json driver files), not the comments: the priority set
    sits wholly inside the window, everything outside the window is exactly
    the demoted set, the two sets never overlap, and every demoted query
    carries a driver-green hash row from one of the two rounds preceding
    catalog.DRIVER_ROTATION_ROUND (staleness bound: rotating out never
    hides a query whose last driver check is older than that)."""
    import glob
    import json
    import os
    import re as _re

    from data_pipeline_kafka_ek_spark.plans import catalog

    names = list(em.queries().keys())
    window = set(names[:50])
    demoted = set(catalog.DRIVER_DEMOTED)
    assert not demoted & set(catalog.DRIVER_PRIORITY)
    outside = [n for n in names if n not in window and n not in demoted]
    assert outside == [], f"unattested queries outside driver window: {outside}"
    for n in catalog.DRIVER_PRIORITY:
        assert n in window, f"priority query {n} fell out of the driver window"
    # every registered query is either in the window or explicitly demoted
    assert len(names) == len(set(names))
    assert set(names) == window | demoted

    # attestation ground truth: last driver-green round per query
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert files, "driver correctness files must be committed alongside the code"
    last_green: dict[str, int] = {}
    for path in files:
        rnd = int(_re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                last_green[name] = max(rnd, last_green.get(name, 0))
    fresh = (catalog.DRIVER_ROTATION_ROUND - 2, catalog.DRIVER_ROTATION_ROUND - 1)
    late = set(catalog.REGISTERED_AFTER_WINDOW)
    rows_only = set(catalog.ROWS_ONLY_NO_ORACLE)
    overflow = set(catalog.WINDOW_OVERFLOW)
    retired = set(catalog.DRIVER_RETIRED)
    exempt = late | rows_only | overflow | retired
    stale = [
        n for n in demoted if last_green.get(n) not in fresh and n not in exempt
    ]
    assert stale == [], (
        "demoted queries whose last driver-green row predates rounds "
        f"{fresh}: {[(n, last_green.get(n)) for n in stale]}"
    )
    # REGISTERED_AFTER_WINDOW is exactly the post-window registrations: a
    # name with a driver-green row must not hide behind it
    abused = [n for n in late if last_green.get(n) in fresh]
    assert abused == [], f"REGISTERED_AFTER_WINDOW entries with green rows: {abused}"
    # ROWS_ONLY_NO_ORACLE is for queries the driver can NEVER hash-check:
    # a name with ANY driver-green row must leave the list
    hashable = [n for n in rows_only if last_green.get(n) is not None]
    assert hashable == [], f"ROWS_ONLY_NO_ORACLE entries with green rows: {hashable}"
    # WINDOW_OVERFLOW is honest only if (a) the must-attest set genuinely
    # exceeded the 50 slots, (b) the list is no larger than that excess,
    # and (c) every overflow entry is exactly ONE round past the bound
    # (anything older has been hiding for more than one re-authoring)
    must_attest = [
        n
        for n in names
        if last_green.get(n) not in fresh
        and n not in late
        and n not in rows_only
        and n not in retired
    ]
    genuine_excess = max(0, len(must_attest) - 50)
    assert len(overflow) <= genuine_excess, (
        f"WINDOW_OVERFLOW has {len(overflow)} entries but the must-attest "
        f"set ({len(must_attest)}) only overflows the window by {genuine_excess}"
    )
    # Formalized steady-state bound (r14, catalog.py preamble): an entry
    # may overflow AT MOST ONCE (the exactly-R-3 check below makes a
    # second overflow impossible), so the must-attest set may never
    # exceed one window + one overflow generation. Past this cap the R-4
    # worst-case attestation promise breaks; new queries must then be
    # local-gate-only until attested queries retire.
    assert len(must_attest) <= 100, (
        f"must-attest set ({len(must_attest)}) exceeds the 100-entry "
        "steady-state cap (window + one overflow generation); stop "
        "registering driver-facing queries until the debt drains"
    )
    too_old = [
        n
        for n in overflow
        if last_green.get(n) != catalog.DRIVER_ROTATION_ROUND - 3
    ]
    assert too_old == [], (
        "WINDOW_OVERFLOW entries more than one round past the staleness "
        f"bound: {[(n, last_green.get(n)) for n in too_old]}"
    )
    # overflow + late entries lead the demoted ordering: first in line for
    # the next window re-authoring
    head = list(catalog.DRIVER_DEMOTED)[: len(late) + len(overflow)]
    assert set(head) == late | overflow, (
        f"never/one-round-over entries must lead DRIVER_DEMOTED, got {head}"
    )
    # DRIVER_RETIRED tier (r16 policy): retirement is earned from ground
    # truth — >= 3 driver-green rounds in the committed CORRECTNESS
    # files — and priced by a named covering twin that REMAINS
    # driver-checkable. Retired names sit at the very tail of queries()
    # (they can never re-enter the window) and in no rotation list.
    green_rounds: dict[str, int] = {}
    for path in files:
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                green_rounds[name] = green_rounds.get(name, 0) + 1
    assert not retired & (set(catalog.DRIVER_PRIORITY) | overflow | late | rows_only)
    under_earned = [n for n in retired if green_rounds.get(n, 0) < 3]
    assert under_earned == [], (
        f"retired without >=3 driver-green rounds: "
        f"{[(n, green_rounds.get(n, 0)) for n in under_earned]}"
    )
    assert set(catalog.RETIRED_TWINS) == retired, (
        "every retired query needs a named covering twin (and only they)"
    )
    for n, twin in catalog.RETIRED_TWINS.items():
        assert twin in set(names), f"{n}: twin {twin} is not registered"
        assert twin not in retired, f"{n}: twin {twin} is itself retired"
        assert twin not in rows_only, f"{n}: twin {twin} is not hash-checkable"
    assert names[-len(retired):] == list(catalog.DRIVER_RETIRED), (
        "retired queries must be the tail of the registration order"
    )


def test_funnel_is_single_pass(spark, sf_dir):
    """The funnel must stay a fold over one scan — the per-level
    join/count formulation silently re-scans the fact table once per
    step count (12 scans for 3 steps when it regressed)."""
    plan = _plan(em.queries()["x_events_funnel"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 2, plan
    assert "In(event_type" in plan          # step filter pushed to the scan
    assert _shuffles(plan) <= 4, plan


def test_bm25_broadcasts_lm_constants(spark, sf_dir):
    """df/N/avgdl are tiny aggregates and must broadcast into the scoring
    join; the per-doc side must never shuffle for them."""
    plan = _plan(em.queries()["x_text_bm25"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2, plan


def test_sessionize_reuses_one_user_partitioning(spark, sf_dir):
    """lag window, running session counter, and the per-session rollup all
    key on the user: one exchange total."""
    plan = _plan(em.queries()["x_events_sessionize"](spark, sf_dir))
    assert _shuffles(plan) <= 2, plan


def test_cohort_retention_is_single_pass(spark, sf_dir):
    """Cohort day is a conditional min inside the one user aggregation —
    the join formulation paid 4 scans and 8 exchanges."""
    plan = _plan(em.queries()["x_events_cohort_retention"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 1, plan
    assert _shuffles(plan) <= 3, plan


def test_round6_quality_ops_are_map_only(spark, sf_dir):
    """The docstrings claim gopher rules and sliding stats are one-scan
    plans: gopher fuses into the scan with ZERO shuffles; the sliding
    window pays exactly its one partition-key shuffle."""
    qs = em.queries()
    g = _plan(qs["x_quality_gopher_rules"](spark, sf_dir))
    assert _shuffles(g) == 0, g
    assert g.count("Scan parquet") == 1
    w = _plan(qs["x_window_sliding_stats"](spark, sf_dir))
    assert _shuffles(w) == 1, w


def test_bigram_lm_broadcasts_count_tables(spark, sf_dir):
    """The bigram/context/vocab tables must broadcast into the scoring
    join (they are vocabulary-bounded); the only non-broadcast shuffles
    are the LM-count groupBys and the final doc-keyed aggregation."""
    p = _plan(em.queries()["x_text_bigram_logprob"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "SortMergeJoin" not in p, p


def test_semantic_dedup_joins_are_bounded(spark, sf_dir):
    """SemDeDup's scale contract: cell assignment is a shuffle-free
    literal-argmax expression (no join at all — the centroids ride in as
    codegen literals), and the candidate stage is an equi-join on the
    cell id: no cartesian product or nested loop anywhere."""
    p = _plan(em.queries()["x_dedup_semantic"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_full_outer_join_plans_as_shuffle_join(spark, sf_dir):
    """FULL OUTER cannot broadcast either side — it must plan as a
    shuffle join on the key (the shape that scales), never a nested
    loop."""
    p = _plan(em.queries()["j_full_outer_join"](spark, sf_dir))
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) .*FullOuter", p), p
    assert "NestedLoop" not in p, p


def test_round7_tpch_shapes(spark, sf_dir):
    """Q4/Q10/Q14-shaped queries keep their intended physical strategies:
    semi join for the EXISTS, dimension broadcasts, TakeOrdered top-k."""
    qs = em.queries()
    p4 = _plan(qs["h4_late_shipment_priority"](spark, sf_dir))
    assert "LeftSemi" in p4, p4                     # EXISTS stays a semi join
    assert _shuffles(p4) <= 3, p4
    p10 = _plan(qs["h10_returned_item_revenue"](spark, sf_dir))
    assert p10.count("BroadcastHashJoin") >= 2, p10  # customer + nation
    assert "TakeOrdered" in p10, p10                 # top-20, never a full sort
    pushed = "".join(re.findall(r"PushedFilters: \[[^\]]*\]", p10))
    assert "EqualTo(l_returnflag,R)" in pushed, pushed
    p14 = _plan(qs["h14_promo_revenue_share"](spark, sf_dir))
    assert "BroadcastHashJoin" in p14, p14           # part broadcasts
    assert _shuffles(p14) <= 1, p14                  # single global agg


def test_hll_register_build_is_one_pass_two_shuffles(spark, sf_dir):
    """The PRODUCTION path (with_exact=False) must stay: ONE scan, ONE
    grouping-sets register-build exchange (per-group and merged __all__
    registers from the same Expand — no second scan for the merge), ONE
    per-group fold exchange. Never a distinct over raw values. The
    catalog query adds the exact-count self-attestation columns, which
    deliberately pay extra scans — production disables them."""
    from data_pipeline_kafka_ek_spark.operators.sketches import hll_distinct
    from data_pipeline_kafka_ek_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "events")
    plan = _plan(hll_distinct(df, "event_type", "user_id", p=8, with_exact=False))
    assert _shuffles(plan) <= 2, plan
    assert plan.count("FileScan") == 1, plan
    assert "Expand" in plan, plan          # grouping sets, not a union re-scan
    assert "BatchEvalPython" not in plan


def test_classifier_score_is_scan_explode_agg(spark, sf_dir):
    """Feature-hashed scoring: one scan, map-side explode + weight
    derivation, one doc-keyed shuffle. No join, no broadcast, no UDF."""
    plan = _plan(em.queries()["x_quality_clf_score"](spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert _shuffles(plan) <= 1, plan
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan


def test_distribution_drift_broadcasts_bounds(spark, sf_dir):
    """PSI drift: the per-group bounds must broadcast into BOTH histogram
    passes — fact rows never shuffle; only (group, bin) counter rows do."""
    plan = _plan(em.queries()["x_events_distribution_drift"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BatchEvalPython" not in plan


def test_r7_profiling_trio_shuffle_bounds(spark, sf_dir):
    """The calibration/profiling trio's docstring shapes, pinned: the
    threshold sweep pays the scorer's doc agg + one 5-group fold (2),
    the length histogram is one scan + one low-cardinality agg (1), the
    skew profile is a key-count agg + per-group fold that reuses the
    window's grp partitioning (2). All single-scan."""
    qs = em.queries()
    bounds = {
        "x_quality_threshold_sweep": 2,
        "x_corpus_length_histogram": 1,
        "x_events_key_skew_profile": 2,
    }
    for name, max_shuffles in bounds.items():
        p = _plan(qs[name](spark, sf_dir))
        assert _shuffles(p) <= max_shuffles, f"{name}:\n{p}"
        assert p.count("Scan parquet") == 1, f"{name}:\n{p}"


def test_h16_broadcasts_and_two_phase_distinct(spark, sf_dir):
    """Q16 shape: exclusion list and part dimension broadcast (no fact
    shuffle for either join); the DISTINCT aggregation pays its two-phase
    dedup+agg shuffles and the top-20 is TakeOrdered, never a sort."""
    p = _plan(em.queries()["h16_supplier_part_breadth"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert _shuffles(p) <= 2, p
    assert "TakeOrdered" in p, p


def test_h18_h21_plan_shapes(spark, sf_dir):
    """Q18: one fact shuffle for the per-order sum, HAVING survivors
    broadcast back (no second fact shuffle), top-20 as TakeOrdered.
    Q21: the double EXISTS correlation must stay a single per-order
    aggregation — never correlated re-scans of the fact — with the
    supplier lookup broadcast and top-10 as TakeOrdered."""
    p18 = _plan(em.queries()["h18_large_volume_customers"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p18
    assert p18.count("BroadcastHashJoin") >= 2
    assert _shuffles(p18) <= 1, p18  # only the per-order aggregation

    p21 = _plan(em.queries()["h21_waiting_supplier"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p21
    assert "BroadcastHashJoin" in p21
    # fact scanned for the join once (plus the broadcast sides); the
    # correlated-subquery formulation would scan lineitem 3x
    assert p21.count("Scan parquet") <= 3, p21


def test_h18_broadcast_guard_degrades_to_shuffle_join(spark, sf_dir):
    """Q18's HAVING-survivor set grows O(SF): below the explicit row
    guard the survivors broadcast (both hops), above it the hint is
    dropped BY DESIGN and the static plan degrades to shuffle joins —
    the fallback is self-documenting, not an AQE surprise."""
    from data_pipeline_kafka_ek_spark.plans import extensions as ext

    guarded = _plan(ext.h18_large_volume(spark, sf_dir))
    assert guarded.count("BroadcastHashJoin") >= 2, guarded

    # with the hint dropped, fixture-sized tables still auto-broadcast on
    # Catalyst's size stats — disable that to see the genuine at-scale
    # shape the guard degrades to
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        degraded = _plan(ext.h18_large_volume(spark, sf_dir, broadcast_limit=0))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert "BroadcastHashJoin" not in degraded, degraded
    assert "SortMergeJoin" in degraded or "ShuffledHashJoin" in degraded, degraded
    # same result either way
    a = ext.h18_large_volume(spark, sf_dir).collect()
    b = ext.h18_large_volume(spark, sf_dir, broadcast_limit=0).collect()
    assert a == b


def _assert_no_partitionless_window(plan: str):
    """Every WindowExec must carry partition columns: a partition-less
    window funnels ALL rows into one task — the single-task-rank shape
    the salted two-phase construction exists to avoid. A Window line
    prints `Window [exprs], [partCols], [order]`; without partitioning
    the middle bracket group is missing (two groups, not three)."""
    for line in plan.splitlines():
        if re.search(r"\bWindow \[", line):
            assert line.count("], [") >= 2, f"partition-less window:\n{line}"


def test_kmv_rollup_reads_raw_table_once(spark, sf_dir):
    """The rollup's one-pass claim as an executed-plan fact: the base
    cell sketches are materialized once, so the returned plan contains
    NO parquet scan — every grouping-set estimate reads checkpointed
    sketch rows, never the raw table again. And since r10, the MERGE
    levels are salted two-phase with the grand total as TakeOrdered:
    no window in the plan — any level — ranks without partition columns
    (the 'all' level used to rank #cells × k rows in one task)."""
    from data_pipeline_kafka_ek_spark.operators.sketches import kmv_rollup
    from data_pipeline_kafka_ek_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    est = kmv_rollup(e, ["event_type", "day"], "user_id", k=16, with_exact=False)
    plan = _plan(est)
    assert "Scan parquet" not in plan, plan
    _assert_no_partitionless_window(plan)
    assert est.count() > 0


def test_kmv_sketch_plans_have_no_partitionless_windows(spark, sf_dir):
    """Same guard for the other two KMV surfaces: kmv_distinct's merged
    __all__ sketch and kmv_set_ops' union sketch take their global top-k
    via TakeOrderedAndProject, never a partition-less rank."""
    from data_pipeline_kafka_ek_spark.operators.sketches import (
        kmv_distinct,
        kmv_set_ops,
    )
    from data_pipeline_kafka_ek_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    d = _plan(kmv_distinct(e, "event_type", "user_id", k=16, with_exact=False))
    _assert_no_partitionless_window(d)
    assert "TakeOrdered" in d, d
    s = _plan(
        kmv_set_ops(
            e, "event_type", "user_id", "view", "purchase", k=16,
            with_exact=False,
        )
    )
    _assert_no_partitionless_window(s)
    assert "TakeOrdered" in s, s


def test_sql_text_csas_plans_like_the_python_twin(spark, sf_dir):
    """The statements-file flagship (plan built purely from SQL text
    through Engine.sql_script) must carry the same scale shape as the
    Python-API twin: the customer dimension broadcasts (the fact side
    never shuffles for the join) and the fact-side filters reach the
    parquet scan."""
    plan = _plan(em.queries()["q_sql_csas_unhappy"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    # the single exchange is the DELIBERATE PARTITION BY re-key (the
    # Kafka-key twin) — the join itself must not shuffle the fact side
    assert _shuffles(plan) == 1 and "REPARTITION_BY_COL" in plan, plan
    assert "PushedFilters" in plan and "IsNotNull" in plan, plan


def test_sql_text_windowed_ctas_single_shuffle(spark, sf_dir):
    """WINDOW TUMBLING rewritten from SQL text plans as one
    partial+final aggregation — a single shuffle, same as the a3
    Python twin."""
    plan = _plan(em.queries()["q_sql_windowed_ctas"](spark, sf_dir))
    assert _shuffles(plan) <= 1, plan


def test_h6_is_zero_shuffle_pushed_scan(spark, sf_dir):
    """Q6 shape: pure filter+agg — every predicate at the scan, no
    exchange other than the single-partition final agg."""
    p = _plan(em.queries()["h6_forecast_revenue"](spark, sf_dir))
    # the only exchange is the SinglePartition final-agg merge; no
    # hash repartitioning anywhere
    assert "Exchange hashpartitioning" not in p, p
    assert p.count("Scan parquet") == 1
    assert "PushedFilters: [" in p and "l_shipdate" in p.split(
        "PushedFilters:"
    )[1].split("]")[0]


def test_h7_h8_h9_single_fact_shuffle_all_dims_broadcast(spark, sf_dir):
    """The Q7/Q8/Q9 family: lineitem-orders is the one hash exchange;
    every dimension rides a broadcast."""
    qs = em.queries()
    for name, min_bcast in (
        ("h7_volume_shipping", 5),
        ("h8_market_share", 7),
        ("h9_product_profit", 4),
    ):
        p = _plan(qs[name](spark, sf_dir))
        assert _shuffles(p) <= 2, f"{name}:\n{p}"
        assert p.count("BroadcastHashJoin") >= min_bcast, f"{name}:\n{p}"
        assert "SortMergeJoin" not in p, f"{name}:\n{p}"


def test_h2_decorrelates_to_partkey_window(spark, sf_dir):
    """Q2 shape: the correlated MIN must be a window over the joined
    slice (the h17 rule), never a second fact scan + self-join."""
    p = _plan(em.queries()["h2_min_acctbal_supplier"](spark, sf_dir))
    assert p.count("Scan parquet") <= 5, p
    assert _shuffles(p) <= 3, p
    assert "SortMergeJoin" not in p, p


def test_h11_h15_scalar_threshold_reuses_persisted_rollup(spark, sf_dir):
    """Q11/Q15 shape: the rollup feeding both the scalar and the filter
    must come from ONE persisted computation (InMemoryRelation in both
    branches), and the scalar enters as a broadcast, never a shuffle."""
    qs = em.queries()
    for name in ("h11_important_parts", "h15_top_supplier"):
        p = _plan(qs[name](spark, sf_dir))
        assert "InMemoryTableScan" in p or "InMemoryRelation" in p, (
            f"{name}:\n{p}"
        )
        assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, (
            f"{name}:\n{p}"
        )
        assert "SortMergeJoin" not in p, f"{name}:\n{p}"


def test_h20_semi_join_broadcasts_qualifying_keys(spark, sf_dir):
    """Q20 shape: the HAVING-filtered (supplier, part) rollup is
    |suppliers|-bounded, so the supplier probe must be a broadcast
    LEFT SEMI — an SMJ here means a needless full-side sort+shuffle."""
    p = _plan(em.queries()["h20_promotion_suppliers"](spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    # one hash exchange: the (supplier, part) rollup; the final ORDER BY
    # range exchange over |suppliers| rows is not a data shuffle
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_h22_anti_join_prunes_order_scan(spark, sf_dir):
    """Q22 shape: the NOT EXISTS side must reach the orders scan as a
    date-pruned two-column projection; the scalar average broadcasts."""
    p = _plan(em.queries()["h22_dormant_customers"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") <= 2, p
    seg = p.split("Scan parquet")
    order_seg = [s for s in seg if "o_custkey" in s.split("ReadSchema")[-1]]
    assert order_seg, p
    assert any("o_orderdate" in s.split("PushedFilters:")[1].split("]")[0]
               for s in order_seg if "PushedFilters:" in s), p


def test_hard_negatives_broadcasts_queries_and_filters_labels(spark, sf_dir):
    """The label disagreement must live in the broadcast join condition
    (same-label pairs never reach scoring), with the usual per-query
    window rank on top."""
    p = _plan(em.queries()["x_ann_hard_negatives"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p


def test_whitening_shuffles_dims_not_corpus(spark, sf_dir):
    """The only hash exchange carries |dims| keys (the posexploded
    stats rollup); the corpus re-enters via broadcast, never a shuffle."""
    p = _plan(em.queries()["x_embedding_whitening"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p


def test_domain_quota_is_two_phase(spark, sf_dir):
    """Both windows must be partitioned (salted pre-truncation, then the
    per-source final rank) — a single unsalted per-source window would
    feed a hot domain's entire corpus through one task."""
    p = _plan(em.queries()["x_pipeline_domain_quota"](spark, sf_dir))
    _assert_no_partitionless_window(p)
    assert p.count("RunningWindowFunction") + p.count("Window") >= 2, p


def test_vocab_coverage_uses_topk_heaps_not_global_rank(spark, sf_dir):
    """Each curve point is a TakeOrderedAndProject over the persisted
    count table; a global rank window over the vocabulary would be a
    single-task sort of the whole vocab."""
    p = _plan(em.queries()["x_text_vocab_coverage"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    _assert_no_partitionless_window(p)


def test_markov_transitions_shuffles_once_then_broadcasts(spark, sf_dir):
    """One user-keyed exchange feeds the lead() window; the transition
    matrix is |event_types|^2 and its row totals join back broadcast."""
    p = _plan(em.queries()["x_events_markov_transitions"](spark, sf_dir))
    # the row-total branch reads the persisted matrix, never the log
    assert p.count("InMemoryTableScan") >= 2, p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    _assert_no_partitionless_window(p)


def test_tfidf_keywords_reuses_tf_rollup(spark, sf_dir):
    """df and the scoring join both read the persisted (source, token)
    rollup — the corpus is scanned once; the source-count scalar enters
    broadcast; the top-5 window is per-source partitioned."""
    p = _plan(em.queries()["x_text_tfidf_keywords"](spark, sf_dir))
    # both the df aggregation and the scoring join read the cache (the
    # cached relation's plan text repeats its child FileScan, so count
    # cache READS, not scan strings)
    assert p.count("InMemoryTableScan") >= 2, p
    _assert_no_partitionless_window(p)


def test_containment_prefix_prunes_contained_side_only(spark, sf_dir):
    """The contained side's posting list is prefix-pruned (rank filter
    over the rarest shingles); the containing side posts its full set;
    the one-sided size filter lives in the join condition; no
    row-at-a-time Python anywhere."""
    p = _plan(em.queries()["x_dedup_containment"](spark, sf_dir))
    assert "BatchEvalPython" not in p
    # (spread()'s bounded global cumsum window over per-partition stats
    # is expected — same as the jaccard path; no assertion on it)
    # the size filter is in the candidate join condition, pre-shuffle
    assert "__n" in p, p


def test_spread_if_narrow_estimates_without_materializing(spark, sf_dir):
    """r13 verdict #9: the narrow-scan guard must decide from file
    metadata, never df.rdd (which forces an analysis pass per call).
    Source-level: no .rdd access anywhere in the engine. Behavior: a
    small single-file corpus spreads to the session parallelism, an
    in-memory frame passes through untouched."""
    import glob
    import os

    from data_pipeline_kafka_ek_spark.operators.parallelism import (
        spread_if_narrow,
    )

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data_pipeline_kafka_ek_spark",
    )
    offenders = []
    for path in glob.glob(f"{pkg}/**/*.py", recursive=True):
        with open(path) as f:
            for i, line in enumerate(f, 1):
                if ".rdd" in line and not line.lstrip().startswith("#") \
                        and "``" not in line:
                    offenders.append(f"{path}:{i}")
    assert offenders == [], f".rdd access in engine source: {offenders}"

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = spread_if_narrow(emb)
    assert out is not emb  # single small file -> spread
    assert "Exchange" in _plan(out)
    mem = spark.createDataFrame([(1,)], "k long")
    assert spread_if_narrow(mem) is mem


def test_spread_if_narrow_passes_through_post_shuffle_frames(spark, sf_dir):
    """A post-shuffle frame over a small scan must NOT be re-spread:
    inputFiles() reports leaf files for the whole lineage, so without
    the scan-rooted check an aggregate over one small file would pay a
    redundant exchange on top of its shuffle-partitioned output."""
    from pyspark.sql import functions as F

    from data_pipeline_kafka_ek_spark.operators.parallelism import (
        spread_if_narrow,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    agg = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    assert spread_if_narrow(agg) is agg
    joined = emb.alias("a").join(
        emb.select(F.col("vec_id").alias("vid")), F.col("vec_id") == F.col("vid")
    )
    assert spread_if_narrow(joined) is joined
    # set operations shuffle too (r14 ADVICE): a post-shuffle
    # intersect/except frame over a small scan must also pass through
    ids = emb.select("vec_id")
    inter = ids.intersect(ids.limit(5))
    assert spread_if_narrow(inter) is inter
    exc = ids.exceptAll(ids.limit(5))
    assert spread_if_narrow(exc) is exc
    dis = ids.distinct()
    assert spread_if_narrow(dis) is dis
    # a union of aggregates carries Aggregate nodes under the Union —
    # the tree walk must find them at depth, not only at the root
    agg2 = emb.groupBy("label").agg(F.sum(F.lit(1)).alias("n"))
    uni = agg.union(agg2)
    assert spread_if_narrow(uni) is uni
    # bare projection over the same small scan still spreads
    assert spread_if_narrow(emb.select("vec_id")) is not emb
    # ...and so does an explode over it (Generate is narrow — it
    # inherits the scan's single split, exactly the case to spread)
    gen = emb.select("vec_id", F.explode("embedding").alias("x"))
    assert spread_if_narrow(gen) is not gen
