"""Query-path cache lifecycle (guide §5: unpersist when done).

The dedup/similarity/sketch/text operators persist slim intermediate
relations (token sets, posting lists, banded signatures, distinct value
sets) because each feeds several consumers inside ONE query — without the
persist the optimizer plans the whole build once per consumer (guide
§2.4, the duplicated-subtree pathology). But the operator itself must
stay lazy (it returns an unevaluated DataFrame), so it cannot unpersist
its own persist — and a session that runs these operators back-to-back
would otherwise pin every intermediate in executor storage forever.

Protocol:

- An operator that persists an intermediate registers it via
  :func:`track`. When the caller passed its own ``caches`` list (the SNM
  recall monitor materializes scalars in-place and releases immediately),
  the registration goes there and the caller owns the lifecycle.
  Otherwise it lands on the session-global pending list.
- The consumer that MATERIALIZES the query (bench.py after each timed
  iteration, tools/check_correctness.py after each oracle comparison,
  any long-lived session between queries) drains the list with
  :func:`release_pending_caches`.

Releasing is always safe: ``unpersist`` never changes results, only
whether a re-evaluation recomputes. Draining between bench iterations is
also a measurement-honesty requirement — Spark's CacheManager substitutes
a still-persisted relation into any structurally-equal plan, so without
the drain a min-of-3 loop reads iterations 2-3 from warm caches and
reports the cached build as if it were computed.
"""

from __future__ import annotations

_PENDING: list = []


def track(df, caches: "list | None" = None):
    """Register a persisted DataFrame for later release and return it.

    ``caches`` (when the caller manages its own release) takes priority;
    otherwise the session-global pending list owns it.
    """
    (_PENDING if caches is None else caches).append(df)
    return df


def release_pending_caches() -> int:
    """Unpersist every globally-tracked cache; returns how many."""
    n = 0
    while _PENDING:
        df = _PENDING.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session cannot unpersist; dropping the reference
            # is all that is left to do
            pass
    return n
