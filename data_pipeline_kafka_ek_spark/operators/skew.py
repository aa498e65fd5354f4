"""Skew mitigation: salting for hot keys beyond what AQE handles.

AQE's skew-join split (on in this engine, session.py) covers sort-merge
joins with oversized partitions. Two cases remain where explicit salting
is the right tool at 100 TB:

* **hot-key aggregation with expensive per-group state** (e.g.
  ``collect_list`` on a celebrity key): partial aggregation still funnels
  every partial for one key through one reducer. ``salted_agg`` does a
  two-phase aggregate — phase 1 groups on (key, salt) spreading one hot
  key over ``n_salts`` reducers, phase 2 merges the per-salt partials.
* **skewed shuffle join where neither side broadcasts**: ``salted_join``
  salts the skewed (big) side randomly-but-deterministically and explodes
  the other side across all salts, turning one hot-key partition into
  ``n_salts`` even ones at the cost of replicating the small side's
  matching rows n_salts times.

Salt = ``hash(unique_col) % n_salts``: deterministic (reproducible runs,
no ``rand()`` in the plan) and uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: str | Column, n_salts: int) -> Column:
    return F.pmod(F.hash(unique_col), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys.

    ``agg_exprs`` maps output column -> one of count/sum/min/max/
    collect_list (the mergeable aggregates; avg = sum+count downstream).
    Phase 1 aggregates per (key, salt); phase 2 merges partials per key —
    the hot key's work spreads over ``n_salts`` reducers in phase 1 and
    phase 2 only touches ``n_salts`` rows per key. ``collect_list``
    partials merge by flattening; element order is salt-dependent, so
    callers needing determinism must ``sort_array`` the result.
    """
    mergers = {
        "count": "sum",
        "sum": "sum",
        "min": "min",
        "max": "max",
        "collect_list": "flatten",
    }
    parsed = {}  # out -> (col, agg)
    for out, expr in agg_exprs.items():
        agg, _, rest = expr.partition("(")
        if agg not in mergers:
            raise ValueError(f"non-mergeable aggregate {agg!r}")
        parsed[out] = (rest.rstrip(")"), agg)

    # count(col) keeps SQL semantics (NULLs excluded); count(*) / count()
    # counts rows
    p1 = [
        (
            F.count(F.lit(1))
            if agg == "count" and col in ("", "*")
            else getattr(F, agg)(col)
        ).alias(out)
        for out, (col, agg) in parsed.items()
    ]
    p2 = [
        (
            F.flatten(F.collect_list(out))
            if mergers[agg] == "flatten"
            else getattr(F, mergers[agg])(out)
        ).alias(out)
        for out, (_, agg) in parsed.items()
    ]
    return (
        df.withColumn("__salt", _salt(unique_col, n_salts))
        .groupBy(key, "__salt")
        .agg(*p1)
        .groupBy(key)
        .agg(*p2)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s ``key`` has pathological hot values and
    ``other`` is too big to broadcast. The skewed side gets a deterministic
    salt; ``other`` is exploded across all ``n_salts`` salt values, so the
    shuffle key (key, salt) splits each hot key into n_salts partitions.

    Only ``inner`` and ``left`` are valid: an outer ``other`` side would
    emit up to n_salts null-padded copies of every unmatched row (the
    explode fabricates rows that exist only for salting).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — outer "
            "'other' sides would duplicate unmatched rows across salts"
        )
    s = skewed.withColumn("__salt", _salt(unique_col, n_salts))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(o, [key, "__salt"], how).drop("__salt")
