"""Shared SQL-text scanning utilities.

One tokenizer for every statement-surface scanner in the engine — the
quoted-span finder, the top-level splitter, and the depth map — so a
quoting or nesting edge case is fixed in exactly one place. All three
Spark SQL quoting forms are honored, each with the doubled-char escape:
``'...'`` string literals, ``"..."`` (a string literal under the default
``spark.sql.ansi.doubleQuotedIdentifiers=false``), and `` `...` ``
quoted identifiers.

Consumers: ``engine.Engine`` (statement routing, DML parsing, window
rewriting), ``sources.acid.conjuncts_from_condition`` (mechanical prune
derivation). Reference: the reference's statement files are plain SQL
text (ksqldb-statements.sql), so text-level scanning IS part of the
product surface, not test scaffolding.
"""

from __future__ import annotations


def quoted_spans(s: str) -> "list[tuple[int, int]]":
    """``[start, end)`` index spans of every quoted region in ``s``."""
    spans, i, n = [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            j = i + 1
            while j < n:
                if s[j] == ch and not (j + 1 < n and s[j + 1] == ch):
                    break
                j += 2 if s[j] == ch else 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
            continue
        i += 1
    return spans


def depth_map(s: str) -> "list[int]":
    """Paren/bracket nesting depth at every index (quote-aware: depth
    never changes inside a quoted region, and quoted indices carry the
    surrounding depth). ``depth[i] == 0`` means index ``i`` is at the
    statement's top level."""
    depths = [0] * len(s)
    depth, i, n = 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            j = i + 1
            while j < n:
                if s[j] == ch and not (j + 1 < n and s[j + 1] == ch):
                    break
                j += 2 if s[j] == ch else 1
            for k in range(i, min(j + 1, n)):
                depths[k] = depth
            i = j + 1
            continue
        if ch in "([":
            depths[i] = depth  # the opener sits at the outer depth
            depth += 1
            i += 1
            continue
        if ch in ")]":
            depth -= 1
        depths[i] = depth
        i += 1
    return depths


def split_top(s: str, want: str, angle_nesting: bool = False) -> "list[str]":
    """Split ``s`` on top-level occurrences of ``want`` — a keyword
    (matched case-insensitively as a whole word; may contain internal
    whitespace like ``GROUP BY``) or the literal ``','``/``';'`` —
    ignoring anything inside quotes or parentheses/brackets.
    ``angle_nesting=True`` additionally treats ``<...>`` as nesting —
    for DDL column lists where generics like ``MAP<STRING, INT>``
    contain commas (never use it on predicate text, where ``<`` is a
    comparison operator)."""
    depth, i, last, out = 0, 0, 0, []
    n = len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            q = ch
            j = i + 1
            while j < n:
                if s[j] == q and not (j + 1 < n and s[j + 1] == q):
                    break
                j += 2 if s[j] == q else 1
            i = j + 1
            continue
        if ch in "([" or (angle_nesting and ch == "<"):
            depth += 1
        elif ch in ")]" or (angle_nesting and ch == ">"):
            depth -= 1
        elif depth == 0:
            if want in (",", ";") and ch == want:
                out.append(s[last:i])
                last = i + 1
            elif want not in (",", ";") and s[i : i + len(want)].upper() == want:
                before = s[i - 1] if i else " "
                after = s[i + len(want)] if i + len(want) < n else " "
                if not (before.isalnum() or before == "_") and not (
                    after.isalnum() or after == "_"
                ):
                    out.append(s[last:i])
                    last = i + len(want)
        i += 1
    out.append(s[last:])
    return out


def find_top_level(s: str, pattern, flags=0) -> "list":
    """All regex matches of ``pattern`` whose start index sits OUTSIDE
    quotes and at paren depth 0 — the safe way to locate a clause
    keyword (GROUP BY, WINDOW, FROM) in a statement that may contain
    subqueries and string literals."""
    import re as _re

    spans = quoted_spans(s)
    depths = depth_map(s)
    out = []
    for m in _re.finditer(pattern, s, flags):
        i = m.start()
        if any(lo <= i < hi for lo, hi in spans):
            continue
        if depths[i] != 0:
            continue
        out.append(m)
    return out


def sub_outside_quotes(s: str, pattern, repl: str, flags=0) -> str:
    """``re.sub`` that only rewrites matches starting OUTSIDE quoted
    regions — for mechanical token rewrites (alias stripping, keyword
    normalization) over predicate text that may contain string literals
    spelling the same token (``note = 's.tomb'`` must keep its literal
    when the source alias ``s`` is stripped)."""
    import re as _re

    spans = quoted_spans(s)
    out, last = [], 0
    for m in _re.finditer(pattern, s, flags):
        if any(lo <= m.start() < hi for lo, hi in spans):
            continue
        out.append(s[last : m.start()])
        out.append(m.expand(repl) if "\\" in repl else repl)
        last = m.end()
    out.append(s[last:])
    return "".join(out)
