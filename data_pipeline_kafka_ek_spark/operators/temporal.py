"""Temporal joins: as-of (point-in-time) and interval (range) joins.

Neither exists as a Spark builtin; both are staples of event/feature
pipelines (point-in-time-correct feature lookup, nearby-event
correlation) and both have native DuckDB counterparts (ASOF JOIN, range
predicates) to oracle against.

Scale-first formulations — no UDFs, no per-key Python:

* ``asof_join`` uses the union trick: tag both sides, union, and take
  the last non-null right-side value over a (key, time)-ordered window.
  That is ONE hash shuffle on the key plus a sort — the same exchange a
  sort-merge join would do — instead of the naive per-key backward scan
  or an inequality join (which Spark executes as a per-key cross
  product). Skewed keys fall under the same AQE/salting story as any
  single-key shuffle.
* ``interval_join`` buckets time into bins of the interval width and
  equi-joins on (key, bin) with each left row exploded into the 1-2
  bins its window can touch, then applies the exact range predicate.
  Candidates per row are bounded by bin occupancy — never a per-key
  cross join — and the bin id is a natural on-disk partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can ORDER BY a column of this type (maps cannot;
    arrays/structs are orderable iff their element/field types are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    same ``key`` and the greatest ``right_ts`` <= ``left_ts`` (< when
    ``strict``); optionally only if within ``tolerance_seconds``.

    Left-outer semantics: left rows with no prior right row keep NULLs.
    Ties on the right side at the same timestamp resolve to the row that
    sorts last on the *orderable* right columns (deterministic); right
    columns of non-orderable types (maps) are carried through but do not
    participate in the tiebreak, so they never fail Spark's sort analysis.
    """
    rcols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    # only orderable right columns may join the ORDER BY tiebreaker — a
    # MapType column would fail sort analysis
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ord_rcols = [c for c in rcols if _orderable(rtypes[c])]

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__rrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("__rts"), *[F.col(c) for c in ord_rcols]
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__rord"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__lrow"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
        ).alias("__rrow"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in ord_rcols]
        ).alias("__rord"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # at equal timestamps the right row (__is_left=0) must sort BEFORE the
    # left row so a non-strict as-of sees it ("<="); strict mode sorts left
    # rows first so same-instant right rows are invisible ("<").  The
    # __rord struct tiebreaker (the orderable subset of the right row)
    # makes duplicate (key, right_ts) right rows resolve deterministically
    # (the greatest right row sorts last and wins last()); it only ever
    # compares rows of the same side, so the NULL __rord on left rows never
    # mixes into the comparison.
    order = [
        F.col("__t").asc(),
        F.col("__is_left").desc() if strict else F.col("__is_left").asc(),
        F.col("__rord").asc_nulls_first(),
    ]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        unioned.withColumn("__last_r", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance_seconds is not None:
        # cast-to-double keeps fractional seconds (unix_timestamp truncates)
        in_tol = (
            F.col("__last_r").isNotNull()
            & (
                F.col("__t").cast("double")
                - F.col("__last_r.__rts").cast("double")
                <= F.lit(tolerance_seconds)
            )
        )
        matched = matched.withColumn(
            "__last_r", F.when(in_tol, F.col("__last_r"))
        )
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__last_r.{c}").alias(c) for c in rcols]
    return matched.select(
        *out_left,
        F.col("__last_r.__rts").alias(f"asof_{right_ts}"),
        *out_right,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_seconds: float,
    upper_seconds: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Interval (range) join: all (left, right) pairs with equal ``key``
    and ``right_ts`` within [left_ts + lower, left_ts + upper] seconds
    (lower may be negative for a look-back window).

    Bucketing: time is binned at the window width; a left row's
    width-long window spans 1-2 consecutive width-sized bins (floor of
    its two endpoints differs by at most one), so the join is
    an equi-join on (key, bin) after a small static explode — candidate
    fan-out is bin occupancy, not per-key row count squared.
    """
    width = float(upper_seconds - lower_seconds)
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    rcols = right_cols or [c for c in right.columns if c not in (key, right_ts)]

    # cast-to-double epoch keeps fractional seconds (unix_timestamp
    # truncates), matching DuckDB's epoch()
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")

    # left window [lsec+lower, lsec+upper] covers the 1-2 width-w bins
    # between floor((lsec+lower)/w) and floor((lsec+upper)/w)
    l_binned = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.col(key).alias("__k"),
        lsec.alias("__lsec"),
        F.explode(
            F.sequence(
                F.floor((lsec + F.lit(lower_seconds)) / F.lit(width)),
                F.floor((lsec + F.lit(upper_seconds)) / F.lit(width)),
            )
        ).alias("__bin"),
    )
    r_binned = right.select(
        F.col(key).alias("__k"),
        rsec.alias("__rsec"),
        F.floor(rsec / F.lit(width)).alias("__bin"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in rcols]
        ).alias("__rrow"),
    )
    joined = l_binned.join(r_binned, ["__k", "__bin"]).filter(
        (F.col("__rsec") >= F.col("__lsec") + F.lit(lower_seconds))
        & (F.col("__rsec") <= F.col("__lsec") + F.lit(upper_seconds))
    )
    # no dedup needed: each right row lives in exactly ONE bin, so a
    # (left, right) pair can only join once even though left explodes
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__rrow.{c}").alias(c) for c in rcols]
    return joined.select(
        *out_left, F.col("__rrow.__rts").alias(f"right_{right_ts}"), *out_right
    )
