"""Data sketches (K-Minimum-Values, Count-Min) for corpus/event accounting.

At 100 TB you never compute ``COUNT(DISTINCT x)`` exactly across an
entire corpus — you sketch it. Spark ships HyperLogLog
(``approx_count_distinct``), but its binary sketch is engine-private and
cannot be oracle-checked. KMV is the classic alternative (Bar-Yossef et
al. 2002, "Counting distinct elements in a data stream"): keep the k
smallest hash values of the element set; if fewer than k survive the
stream, the sketch IS the exact distinct set, else estimate
``D ≈ (k-1) / h_(k)`` where ``h_(k)`` is the k-th smallest hash mapped
to (0,1).

Two properties make it the right teaching/verification sketch here:

* **Deterministic** — md5 is the hash, lexicographic order on the hex
  digest IS numeric order on the underlying 128-bit value, so any engine
  computes the identical sketch and the identical estimate. That turns an
  *approximate* operator into an exactly-oracle-checkable query.
* **Mergeable** — the union sketch of two element sets is the k smallest
  of the union of their sketches. That is what makes KMV one-pass and
  embarrassingly distributed: partitions sketch locally, the combine is a
  tiny top-k merge. The ``__all__`` row emitted by :func:`kmv_distinct`
  is computed exactly that way (merge of the per-group sketches, never
  re-reading the input), attesting the merge law against the oracle.

Scale shape: one ``distinct`` on (group, value) — map-side partial dedup,
then a shuffle of slim (group, 32-char digest) rows — and one per-group
top-k window. No collect, no driver loop; sketch size k rows per group.

Reference scope: the reference has no sketches (its aggregations are
ksqldb-statements.sql:62-103 exact counts); this extends the engine for
LLM-scale corpus accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from data_pipeline_kafka_ek_spark.caching import track

# 15 hex chars = 60 bits: fits a signed 64-bit long in both engines,
# and the (0,1) mapping divides by 16**15 exactly (a power of two, so
# the double division is exact and cross-engine stable).
_FRAC_HEX_CHARS = 15
_FRAC_DENOM = float(16**_FRAC_HEX_CHARS)


def _hash_frac(h):
    """Map the first 15 hex chars of an md5 digest to a double in (0,1)."""
    return F.conv(F.substring(h, 1, _FRAC_HEX_CHARS), 16, 10).cast(
        "double"
    ) / F.lit(_FRAC_DENOM)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    with_exact: bool = True,
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Per-group KMV distinct-count estimate plus a merged ``__all__`` row.

    Returns one row per group value and one ``__all__`` row:
    ``(grp, n_sketch, kmv_estimate, n_exact, rel_err)``. The ``__all__``
    estimate is produced by MERGING the per-group sketches (k smallest of
    the distinct union of their hashes) — the one-pass distributed shape —
    not by re-sketching the input.

    ``with_exact=True`` joins in the true distinct counts so the result
    row carries its own error; at real scale you would drop it (the whole
    point of the sketch), so it is a flag.

    NULL handling: NULL *values* are excluded (SQL ``COUNT(DISTINCT)``
    convention — previously a NULL value produced a NULL md5 whose sort
    position differed between engines); a group whose values are all
    NULL therefore has no row. NULL *groups* are preserved as their own
    row (the eqNullSafe join below), matching GROUP BY semantics.
    """
    vals = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
    )
    if with_exact:
        # sketch build + exact counts both read vals: one scan + one
        # distinct shuffle, not two (guide §2.4)
        vals = track(vals.persist(), caches)
    hashed = vals.select("grp", F.md5(F.col("v").cast("string")).alias("h"))

    # two-phase k-smallest (same construction as kmv_set_ops): a salted
    # local top-k so no window ever ranks a group's FULL distinct-hash
    # set, then the global top-k over the n_salt*k survivors — the
    # result is identical (the k smallest of a set are among the k
    # smallest of any partition of it), only the shuffle shape changes
    n_salt = 32
    salted = hashed.withColumn("__s", F.pmod(F.xxhash64("h"), F.lit(n_salt)))
    w_local = Window.partitionBy("grp", "__s").orderBy("h")
    local = (
        salted.withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
        .select("grp", "h")
    )
    w = Window.partitionBy("grp").orderBy("h")
    topk = (
        local.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("grp", "h")
    )

    per_group = topk.groupBy("grp").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("hk")
    )

    # merge law: union sketch = k smallest of the distinct union of the
    # per-group sketches (same value in two groups hashes identically, so
    # the union must dedup hashes before ranking)
    merged = (
        topk.select("h")
        .distinct()
        # global top-k as orderBy+limit: Spark plans TakeOrderedAndProject
        # (distributed per-partition top-k, merged on the driver) — no
        # partition-less window ever enters the plan
        .orderBy("h")
        .limit(k)
        .groupBy()
        .agg(F.count("*").alias("n_sketch"), F.max("h").alias("hk"))
        .select(F.lit("__all__").alias("grp"), "n_sketch", "hk")
    )

    sketches = per_group.unionByName(merged)
    # KMV estimator: exact when the sketch didn't fill, else (k-1)/h_(k)
    est = F.round(
        F.when(
            F.col("n_sketch") < k, F.col("n_sketch").cast("double")
        ).otherwise(F.lit(float(k - 1)) / _hash_frac(F.col("hk")))
    ).cast("long")
    out = sketches.select(
        "grp",
        F.col("n_sketch").cast("long").alias("n_sketch"),
        est.alias("kmv_estimate"),
    )

    if not with_exact:
        return out
    exact_pg = vals.groupBy("grp").agg(F.count("*").alias("n_exact"))
    exact_all = (
        vals.select("v")
        .distinct()
        .groupBy()
        .agg(F.count("*").alias("n_exact"))
        .select(F.lit("__all__").alias("grp"), "n_exact")
    )
    exact = exact_pg.unionByName(exact_all)
    # eqNullSafe: a genuine NULL group survives the sketch build as its
    # own grp=NULL row; a plain equi-join would silently drop it from
    # the with_exact output
    return out.join(
        F.broadcast(exact), out["grp"].eqNullSafe(exact["grp"])
    ).drop(exact["grp"]).select(
        "grp",
        "n_sketch",
        "kmv_estimate",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(
            F.try_divide(
                F.col("kmv_estimate") - F.col("n_exact"), F.col("n_exact")
            ),
            4,
        ).alias("rel_err"),
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ga,
    gb,
    k: int = 64,
    with_exact: bool = True,
    caches: "list[DataFrame] | None" = None,
    n_salt: int = 32,
) -> DataFrame:
    """KMV sketch SET OPERATIONS between the two groups ``ga``/``gb``:
    union cardinality, intersection cardinality and Jaccard estimated
    from the k-minimum-value sketches alone — the classic KMV identity
    that any union-sketch element below the union's kth value that
    appears in BOTH per-group sketches is an intersection witness, so
    ``J ≈ n_both / k`` and ``|A∩B| ≈ J · D_union``.

    Scale shape: per-group k-smallest is computed in TWO phases — a
    salted local top-k (``n_salt`` subgroups, each ranking only its own
    slice) then a global top-k over the ``n_salt·k`` survivors — so no
    window ever ranks a group's full distinct-value set; the estimate
    stage then runs on ≤ 2k sketch rows. md5 + lexicographic order keep
    every intermediate identical across engines, so the approximate
    result is exactly hash-checkable (one rounded division chain at the
    end, mirrored operation-for-operation by the SQL oracle).

    Returns ONE row: ``(n_sketch_union, union_est, inter_est,
    jaccard_est[, union_exact, inter_exact])``. When the union sketch
    did not fill (< k distinct values) every estimate is exact by
    construction.
    """
    vals = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull() & F.col("grp").isin(ga, gb))
        .distinct()
    )
    if with_exact:
        # sketch build + exact counts both read vals (guide §2.4)
        vals = track(vals.persist(), caches)
    hashed = vals.select("grp", F.md5(F.col("v").cast("string")).alias("h"))
    salted = hashed.withColumn(
        "__s", F.pmod(F.xxhash64("h"), F.lit(n_salt))
    )
    w_local = Window.partitionBy("grp", "__s").orderBy("h")
    local = (
        salted.withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
        .select("grp", "h")
    )
    w_grp = Window.partitionBy("grp").orderBy("h")
    topk = (
        local.withColumn("__rn", F.row_number().over(w_grp))
        .filter(F.col("__rn") <= k)
        .select("grp", "h")
    )
    memb = topk.groupBy("h").agg(
        F.max((F.col("grp") == F.lit(ga)).cast("int")).alias("in_a"),
        F.max((F.col("grp") == F.lit(gb)).cast("int")).alias("in_b"),
    )
    # global top-k over the ≤2k membership rows via TakeOrdered — never a
    # partition-less window
    union_sketch = memb.orderBy("h").limit(k)
    stats = union_sketch.agg(
        F.count("*").alias("n_u"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    d_union = F.lit(float(k - 1)) / _hash_frac(F.col("hk"))
    full = F.col("n_u") >= k
    out = stats.select(
        F.col("n_u").cast("long").alias("n_sketch_union"),
        F.round(
            F.when(full, d_union).otherwise(F.col("n_u").cast("double"))
        )
        .cast("long")
        .alias("union_est"),
        F.when(
            full,
            F.round(
                d_union * (F.col("n_both") * F.lit(1.0) / F.col("n_u"))
            ).cast("long"),
        )
        .otherwise(F.col("n_both").cast("long"))
        .alias("inter_est"),
        F.round(F.col("n_both") * F.lit(1.0) / F.col("n_u"), 4).alias(
            "jaccard_est"
        ),
    )
    if not with_exact:
        return out
    # ONE pass computes both exact counts: per-value group spread, then
    # union = all values, intersection = values seen in both groups
    exact = (
        vals.groupBy("v")
        .agg(F.count_distinct("grp").alias("__g"))
        .agg(
            F.count("*").cast("long").alias("union_exact"),
            F.coalesce(
                F.sum((F.col("__g") == 2).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias("inter_exact"),
        )
    )
    return out.crossJoin(F.broadcast(exact))


def kmv_rollup(
    df: DataFrame,
    dim_cols: "list[str]",
    value_col: str,
    k: int = 64,
    with_exact: bool = True,
    n_salt: int = 32,
    caches: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Grouping-sets distinct-count sketches from ONE raw pass: build a
    KMV sketch per base cell ``(d1, d2)``, then derive the per-``d1``,
    per-``d2`` and grand-total sketches by MERGING cell sketches (k
    smallest of their deduped union) — the cascading-rollup shape
    (``a_cascade_rollup``) applied to a mergeable sketch, so every
    coarser level reads ≤ k rows per base cell, never the raw data
    again. The same md5/lexicographic construction as
    :func:`kmv_distinct` keeps every level exactly hash-checkable.

    Returns one row per (grouping set, key):
    ``(gset, key, n_sketch, kmv_estimate[, n_exact, rel_err])`` where
    ``gset`` ∈ {"cell", d1, d2, "all"} and ``key`` is the stringified
    group value ("d1|d2" for cells, "*" for the grand total). NULL
    dimension values are real GROUP BY keys: they render as the
    sentinel ``"<null>"`` inside keys (so a NULL cell coordinate is
    distinct from an absent one and the with_exact join can never drop
    a NULL group). Real values are escaped (``\\`` → ``\\\\``, ``|`` →
    ``\\|``, ``<`` → ``\\<``) before rendering, so a literal "<null>"
    string stays distinct from a real NULL and a literal ``|`` cannot
    shift the cell-key split — no collision caveat.
    """
    d1, d2 = dim_cols
    vals = (
        df.select(
            F.col(d1).alias("g1"),
            F.col(d2).alias("g2"),
            F.col(value_col).alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .distinct()
        # the distinct (g1, g2, v) relation feeds BOTH the sketch build
        # and the with_exact cube — persist so the raw scan + distinct
        # shuffle run once per query, not once per consumer (guide §2.4;
        # at 100 TB this spills to executor disk, still far cheaper than
        # a second full scan + exchange of the raw table)
        .persist()
    )
    vals = track(vals, caches)
    hashed = vals.select(
        "g1", "g2", F.md5(F.col("v").cast("string")).alias("h")
    )
    # base cells: salted two-phase k-smallest (no full-cell ranking task)
    salted = hashed.withColumn("__s", F.pmod(F.xxhash64("h"), F.lit(n_salt)))
    w_local = Window.partitionBy("g1", "g2", "__s").orderBy("h")
    local = (
        salted.withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
        .select("g1", "g2", "h")
    )
    w_cell = Window.partitionBy("g1", "g2").orderBy("h")
    cell = (
        local.withColumn("__rn", F.row_number().over(w_cell))
        .filter(F.col("__rn") <= k)
        .select("g1", "g2", "h")
        # materialize the base-cell sketches ONCE (≤ k rows per cell):
        # the four rollup branches below read this checkpoint, so the
        # raw table is scanned exactly once however many grouping sets
        # are reported — the one-pass claim as an executed-plan fact
        .localCheckpoint(eager=True)
    )

    def _estimate(sketch: DataFrame, part_cols: "list[str]", gset, key_expr):
        agg = sketch.groupBy(*part_cols).agg(
            F.count("*").alias("n_sketch"), F.max("h").alias("hk")
        )
        est = F.round(
            F.when(
                F.col("n_sketch") < k, F.col("n_sketch").cast("double")
            ).otherwise(F.lit(float(k - 1)) / _hash_frac(F.col("hk")))
        ).cast("long")
        return agg.select(
            F.lit(gset).alias("gset"),
            key_expr.alias("key"),
            F.col("n_sketch").cast("long").alias("n_sketch"),
            est.alias("kmv_estimate"),
        )

    def _merge_estimate(part_cols: "list[str]", gset, key_expr):
        # Marginal/grand-total sketch merge in TWO exchanges (guide §2.4;
        # previously three — dropDuplicates, salted local window, global
        # window — plus a separate estimate aggregate). Phase 1 keeps each
        # salt slice's k smallest DISTINCT hashes with a dense_rank group
        # limit: duplicates of a hash share a rank, so the former dedup
        # exchange is unnecessary, and Spark's WindowGroupLimit keeps
        # per-task state at k ranks (never a full-group buffer). The same
        # h always lands in the same slice (the salt is a hash of h), so
        # slices dedup independently and their union is duplicate-free
        # ACROSS slices by construction. Phase 2 merges the ≤ n_salt
        # bounded survivor sets per group with collect_set (bounded:
        # ≤ n_salt·k distinct values per group buffer) and the estimate
        # reads the merged sketch array directly — size(hs) is n_sketch
        # and the last element is the k-th smallest hash — so the former
        # per-level estimate aggregate collapses into a projection.
        # Exactly the same sketch as the window chain: the k smallest
        # distinct values of a set are among the k smallest distinct of
        # any hash-partition of it.
        salted = cell.withColumn(
            "__s", F.pmod(F.xxhash64("h"), F.lit(n_salt))
        )
        w_local = Window.partitionBy(*(part_cols + ["__s"])).orderBy("h")
        local = salted.withColumn(
            "__dr", F.dense_rank().over(w_local)
        ).filter(F.col("__dr") <= k)
        merged = local.groupBy(*part_cols).agg(
            F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
        )
        n_sk = F.size("hs")
        est = F.round(
            F.when(n_sk < k, n_sk.cast("double")).otherwise(
                # element_at is 1-indexed and only evaluated when the
                # sketch filled (n_sk == k >= 1), so the index is valid
                F.lit(float(k - 1))
                / _hash_frac(F.element_at("hs", n_sk))
            )
        ).cast("long")
        return merged.select(
            F.lit(gset).alias("gset"),
            key_expr.alias("key"),
            n_sk.cast("long").alias("n_sketch"),
            est.alias("kmv_estimate"),
        )

    def _ks(col):
        # null-safe key rendering: NULL is its own group, never dropped.
        # Real values are ESCAPED (backslash, then the '|' separator and
        # the sentinel's '<') so a literal "<null>" string stays a
        # distinct group from a real NULL, and a literal '|' inside a
        # value can never shift the cell-key split — mirrored
        # replace-for-replace in the SQL oracle
        esc = F.replace(
            F.replace(
                F.replace(
                    F.col(col).cast("string"), F.lit("\\"), F.lit("\\\\")
                ),
                F.lit("|"),
                F.lit("\\|"),
            ),
            F.lit("<"),
            F.lit("\\<"),
        )
        return F.coalesce(esc, F.lit("<null>"))

    cell_key = F.concat_ws("|", _ks("g1"), _ks("g2"))
    parts = [
        _estimate(cell, ["g1", "g2"], "cell", cell_key),
        _merge_estimate(["g1"], d1, _ks("g1")),
        _merge_estimate(["g2"], d2, _ks("g2")),
        _merge_estimate([], "all", F.lit("*")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not with_exact:
        return out
    # ONE cube pass computes the exact distinct count for all four
    # grouping sets (Spark plans cube as a single Expand + aggregation);
    # grouping() flags distinguish a REAL NULL dimension value from a
    # cube subtotal row
    cubed = vals.cube("g1", "g2").agg(
        F.count_distinct("v").alias("n_exact"),
        F.grouping("g1").alias("__a1"),
        F.grouping("g2").alias("__a2"),
    )
    is_cell = (F.col("__a1") == 0) & (F.col("__a2") == 0)
    is_d1 = (F.col("__a1") == 0) & (F.col("__a2") == 1)
    is_d2 = (F.col("__a1") == 1) & (F.col("__a2") == 0)
    exact = cubed.select(
        F.when(is_cell, F.lit("cell"))
        .when(is_d1, F.lit(d1))
        .when(is_d2, F.lit(d2))
        .otherwise(F.lit("all"))
        .alias("gset"),
        F.when(is_cell, cell_key)
        .when(is_d1, _ks("g1"))
        .when(is_d2, _ks("g2"))
        .otherwise(F.lit("*"))
        .alias("key"),
        "n_exact",
    )
    # left join: cube over an EMPTY input yields zero rows (no global
    # aggregate row), so the sketch side's n_sketch=0 'all' row must
    # surface n_exact=0 rather than vanish through an inner join
    return out.join(F.broadcast(exact), ["gset", "key"], "left").select(
        "gset",
        "key",
        "n_sketch",
        "kmv_estimate",
        F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias("n_exact"),
        F.round(
            F.try_divide(
                F.col("kmv_estimate") - F.coalesce(F.col("n_exact"), F.lit(0)),
                F.coalesce(F.col("n_exact"), F.lit(0)),
            ),
            4,
        ).alias("rel_err"),
    )


def quantile_grid(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    n_bins: int = 128,
    with_exact: bool = True,
) -> DataFrame:
    """Fixed-grid (equi-width histogram) quantile sketch per group.

    The mergeable-histogram workhorse: bucket each value into one of
    ``n_bins`` equi-width bins over the group's [min, max], keep one
    counter per bin, and read quantiles off the cumulative histogram
    (estimate = midpoint of the bin containing rank ``ceil(q*n)``).
    Error is bounded by half a bin width — the trade every metrics
    backend makes. Like the other sketches here the construction is
    exactly deterministic (integer bin arithmetic + fixed rank rule), so
    the *approximate* operator is *exactly* oracle-checkable.

    Scale shape: one pass for per-group bounds (a groupBy on the group
    key), one pass binning values into a ``groupBy(group, bin)`` with
    map-side partial sums — the shuffle carries at most ``groups *
    n_bins`` counter rows, and the histogram's element-wise-sum merge IS
    that partial aggregation. The cumulative read-off is a window over
    bin-count rows (<= n_bins per group), not values.
    ``with_exact`` joins the true percentiles for error columns — the
    exact computation the sketch replaces, kept for the oracle path.

    Returns ``(grp, quantile, n, qestimate[, exact, abs_err])``.
    """
    qs = sorted(quantiles)
    bounds = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.count(value_col).alias("__n"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    binned = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .join(bounds, "grp")
        .withColumn(
            "__bin",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((F.col("__v") - F.col("__lo")) / width),
                    F.lit(n_bins - 1),
                )
            ).cast("long"),
        )
    )
    hist = binned.groupBy("grp", "__lo", "__hi", "__n", "__bin").agg(
        F.count(F.lit(1)).alias("__c")
    )
    cum_w = (
        Window.partitionBy("grp")
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(cum_w))
    probed = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("quantile")
    ).withColumn("__target", F.ceil(F.col("quantile") * F.col("__n")))
    est = (
        probed.filter(
            (F.col("__cum") >= F.col("__target"))
            & (F.col("__cum") - F.col("__c") < F.col("__target"))
        )
        .withColumn(
            "qestimate",
            F.round(
                F.col("__lo") + (F.col("__bin") + F.lit(0.5)) * width, 4
            ),
        )
        .select(
            "grp", "quantile", F.col("__n").cast("long").alias("n"), "qestimate"
        )
    )
    if not with_exact:
        return est
    exact = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.percentile(value_col, F.array(*[F.lit(float(q)) for q in qs])).alias(
                "__p"
            )
        )
        .select(
            "grp",
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(float(q)) for q in qs]), F.col("__p")
                )
            ).alias("__z"),
        )
        .select(
            "grp",
            F.col("__z")["0"].alias("quantile"),
            F.round(F.col("__z")["__p"], 4).alias("exact"),
        )
    )
    return est.join(exact, ["grp", "quantile"]).select(
        "grp",
        "quantile",
        "n",
        "qestimate",
        "exact",
        F.round(F.abs(F.col("qestimate") - F.col("exact")), 4).alias("abs_err"),
    )


def countmin_freq(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
    with_exact: bool = True,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for every distinct value of ``value_col``.

    The sketch is a ``depth x width`` counter grid; row ``i`` buckets each
    value by ``md5(f"{i}:{value}")`` and the estimate is the MIN over the
    d bucket counters — always an overestimate (collisions only add), by
    at most ``2N/width`` with probability ``1 - 2^-depth``. Like
    :func:`kmv_distinct`, the md5 bucketing makes the grid engine-identical
    and the counters are plain sums, so the sketch is
    **order-independent and mergeable** (grids from different partitions
    add element-wise — here that merge IS the partial aggregation of one
    ``groupBy``), and an *approximate* operator is *exactly*
    oracle-checkable.

    Scale shape (the 100 TB path is ``with_exact=False``): the grid is
    built straight from raw rows — each row fans out to its ``depth``
    ``(i, j)`` coordinates and the ``groupBy(i, j)`` does map-side partial
    sums, so the shuffle carries at most ``partitions * depth * width``
    counter rows no matter the input size. No exact per-value count feeds
    the grid. The estimate side buckets the *distinct* values (the output
    is per-value, so that dedup shuffle is inherent to the asked-for
    result, not sketch overhead) and joins their d bucket keys against the
    tiny broadcast grid. ``with_exact=True`` additionally computes true
    per-value counts for the error columns — that IS the exact computation
    the sketch approximates, so it exists only for the oracle/verification
    path. Returns ``(value, cms_estimate[, n_exact, overestimate])``.
    """

    def bucketed(rel: DataFrame) -> DataFrame:
        """Fan each row out to its depth (i, j) grid coordinates."""
        return rel.select(
            "v",
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i"),
        ).withColumn(
            "j",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"),
                            F.lit(":"),
                            F.col("v").cast("string"),
                        )
                    ),
                    1,
                    _FRAC_HEX_CHARS,
                ),
                16,
                10,
            ).cast("long")
            % width,
        )

    # NULL values excluded (a NULL value hashes to a NULL bucket row that
    # the estimate join can never retrieve — drop it on both engine sides)
    vals = df.select(F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    # grid from RAW rows: count(*) per (i, j) with map-side combine — the
    # shuffle is counter rows, never value rows
    grid = bucketed(vals).groupBy("i", "j").agg(F.count("*").alias("counter"))
    est = (
        bucketed(vals.distinct())
        .join(F.broadcast(grid), ["i", "j"])
        .groupBy("v")
        .agg(F.min("counter").cast("long").alias("cms_estimate"))
    )
    if not with_exact:
        return est
    exact = vals.groupBy("v").agg(F.count("*").alias("n_exact"))
    return est.join(exact, "v").select(
        "v",
        "cms_estimate",
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.col("cms_estimate") - F.col("n_exact")).cast("long").alias(
            "overestimate"
        ),
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 8,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate plus a merged
    ``__all__`` row (Flajolet et al. 2007, "HyperLogLog: the analysis of
    a near-optimal cardinality estimation algorithm").

    Spark ships HLL as ``approx_count_distinct``, but its binary sketch
    is engine-private; this is the open twin — md5-derived registers so
    every engine computes the identical sketch and the identical
    estimate, turning the approximate operator into an exactly
    value-hash-checkable query (same design stance as :func:`kmv_distinct`).

    Construction: ``m = 2**p`` registers per group; for each value the
    first ``p/4`` hex chars of ``md5(value)`` pick the register and the
    next 15 hex chars (60 bits) supply ``rho`` = 1 + number of leading
    zero bits (61 if all sixty are zero). Register value is the MAX rho
    observed — max is idempotent and commutative, so unlike KMV **no
    up-front distinct is needed**: the register build is one
    ``groupBy(group, register).max(rho)`` with map-side combine, and the
    merge law (union sketch = element-wise register max) is exactly that
    same aggregation — the ``__all__`` row is produced by max-merging the
    per-group registers, never re-reading the input.

    Estimator: ``E = alpha_m * m^2 / sum_j 2^(-M_j)`` with the
    small-range correction ``E <= 2.5m and V > 0 -> m * ln(m / V)``
    (V = untouched registers). The harmonic-mean denominator is summed
    EXACTLY — each ``2^(-M_j)`` is scaled by ``2^61`` into an integer and
    accumulated in DECIMAL(38,0) — so both engines divide the same exact
    integer and the double math is a single deterministic division (the
    same fixed-point trick as h_window_cumulative_revenue's DECIMAL
    accumulation).

    Scale shape: ONE shuffle of (group, register, partial-max) rows —
    at most ``groups * m`` after map-side combine regardless of input
    size — then a per-group fold over <= m register rows. This is the
    100 TB COUNT(DISTINCT) answer when even KMV's per-partition top-k
    sort is too much state: HLL register merge is a pure max.

    Returns ``(grp, n_registers, hll_estimate[, n_exact, rel_err])``.
    """
    if p % 4 != 0:
        raise ValueError("p must be a multiple of 4 (hex-nibble register addressing)")
    if p < 8:
        # the alpha constant below is Flajolet's m >= 128 value; smaller
        # register counts need the small-m constants and would return a
        # silently biased estimate — refuse loudly instead
        raise ValueError("p must be >= 8 (alpha_m constant is the m >= 128 value)")
    m = 1 << p
    hex_b = p // 4
    # alpha_m for m >= 128 (Flajolet et al. Fig. 3); spliced as the same
    # Python-computed literal into the DuckDB oracle
    alpha = 0.7213 / (1.0 + 1.079 / m)

    h = F.md5(F.col("v").cast("string"))
    wv = F.conv(F.substring(h, hex_b + 1, _FRAC_HEX_CHARS), 16, 10).cast("long")
    rho = F.when(wv == 0, F.lit(61)).otherwise(
        F.lit(60) - F.length(F.bin(wv)) + F.lit(1)
    )
    # ONE pass builds the per-group registers AND the merged __all__
    # registers: GROUPING SETS ((grp, reg), (reg)) expands each row into
    # both aggregation keys map-side, partial-max combines before the
    # single shuffle, and the (reg)-only rows (grp = NULL) ARE the
    # element-wise-max merged sketch — the merge law executed inside one
    # aggregation instead of a second scan of the input.
    # NULL values excluded (COUNT(DISTINCT) convention; a NULL value would
    # otherwise yield NULL register/rho rows) — NULL groups preserved
    sketches = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .select(
            "grp",
            F.conv(F.substring(h, 1, hex_b), 16, 10).cast("long").alias("reg"),
            rho.alias("rho"),
        )
        .groupingSets([["grp", "reg"], ["reg"]], "grp", "reg")
        # grouping() (not a NULL test): a genuine NULL group value must
        # not be folded into the merged row
        .agg(F.max("rho").alias("mj"), F.grouping("grp").alias("__g"))
        .select(
            F.when(F.col("__g") == 1, F.lit("__all__"))
            .otherwise(F.col("grp"))
            .alias("grp"),
            "reg",
            "mj",
        )
    )

    # exact fixed-point harmonic denominator: sum of 2^(61-mj) integers
    term = F.expr("shiftleft(cast(1 as bigint), cast(61 - mj as int))")
    folded = sketches.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(term.cast("decimal(38,0)")).alias("present_sum"),
    )
    two61 = F.lit(1 << 61).cast("decimal(38,0)")
    v_empty = F.lit(m) - F.col("n_present")
    total = F.col("present_sum") + v_empty.cast("decimal(38,0)") * two61
    e_raw = F.lit(alpha * m * m * float(1 << 61)) / total.cast("double")
    v_dbl = v_empty.cast("double")
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_dbl),
    ).otherwise(e_raw)
    out = folded.select(
        "grp",
        F.col("n_present").cast("long").alias("n_registers"),
        F.round(e).cast("long").alias("hll_estimate"),
    )
    if not with_exact:
        return out
    # the exact counts are the computation the sketch REPLACES — kept only
    # for the oracle/self-attestation path. Persist the slim distinct
    # (grp, v) set so the per-group and global counts share one scan.
    vals = track(
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .persist()
    )
    exact = vals.groupBy("grp").agg(F.count("*").alias("n_exact")).unionByName(
        vals.select("v")
        .distinct()
        .groupBy()
        .agg(F.count("*").alias("n_exact"))
        .select(F.lit("__all__").alias("grp"), "n_exact")
    )
    # eqNullSafe: the register build deliberately keeps a genuine NULL
    # group as its own sketch row (see the grouping() note above); a
    # plain equi-join would silently drop it from the with_exact output
    return out.join(
        F.broadcast(exact), out["grp"].eqNullSafe(exact["grp"])
    ).drop(exact["grp"]).select(
        "grp",
        "n_registers",
        "hll_estimate",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(
            (F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )
