"""ACID transaction-log table: the production form of the changelog
materialization (reference: the compacted-topic TABLE abstraction,
ksqldb-statements.sql:42-43), built Delta-protocol-style on plain parquet
plus an ordered JSON commit log — no external table-format dependency,
same interface shape as ``sources/cdc.py::MaterializedTable`` but with the
four properties that class's bucketed-rewrite twin documents as missing:

* **Atomic commits** — a commit is published with a true put-if-absent of
  its fully-written JSON body (``_write_text_atomic``): on the local
  filesystem a hard ``link(2)`` of a complete temp file (link fails with
  EEXIST if the destination exists and never exposes partial content); on
  HDFS a ``rename`` (atomic server-side, fails when the destination
  exists). Readers either see the whole commit or none of it; data files
  are immutable once referenced.
* **Dense versions / optimistic concurrency** — the publish primitive IS
  the arbiter: version ``v`` exists only if its writer observed ``v-1``
  published, so the log never has gaps (Delta's dense-version rule). A
  writer that loses the publish race re-reads the log tail, re-runs
  conflict detection against the *published* winner (never against an
  unpublished in-flight writer — there is no claimed-but-unpublished
  state to mis-judge), and either retries on top (blind append, or a
  merge whose read set is intact) or raises ``ConcurrentModification``
  (a merge whose rewritten files were removed under it). A crashed
  writer leaves only an unlinked temp file — the next writer reuses the
  same version number; no version is ever parked.
* **Snapshot isolation + time travel** — ``read(version=k)`` reconstructs
  the live file set at any retained version; concurrent commits never
  tear an in-flight read (its file list is pinned when the snapshot is
  taken). ``vacuum(retain_versions=k)`` deletes data files only older
  snapshots reference and advances a watermark so time travel below it
  raises cleanly instead of failing mid-scan.
* **Idempotent streaming writes** — each commit can carry a
  ``(app_id, batch_id)`` transaction action; a replayed foreachBatch
  micro-batch with an already-recorded batch id is skipped, giving
  exactly-once sinks over at-least-once replays. The guard re-checks
  after every lost commit race, so two concurrent replays of the same
  batch cannot both land.

Scale design (the part that must survive 100 TB):

* The log is O(commits) tiny JSON files; every ``checkpoint_interval``
  commits a ``<v>.checkpoint.json`` file materializes the full live add
  set, the per-app txn high-water marks, and the current schema. Snapshot
  construction, ``txn_seen`` and schema lookup all read one checkpoint +
  the log tail — never the whole history. Checkpoints are discovered from
  the same directory listing as the commits themselves (no mutable
  pointer file to half-read). Because versions are dense, a checkpoint at
  ``v`` provably covers every commit ``<= v`` — no late-publishing lower
  version can appear after the fact and be silently excluded.
* Each commit's data files are key-RANGE clustered
  (``repartitionByRange`` on the merge key) and every add action records
  the file's ``[min_key, max_key]``. MERGE prunes with those stats: only
  files whose range overlaps the incoming change keys are rewritten —
  merge cost is proportional to the touched key range, not table size
  (same motivation as MaterializedTable's bucket rewrite, but with
  file-level stats instead of a fixed bucket grid).
* Per-commit file statistics come from ONE Spark job grouped by
  ``input_file_name()`` over the commit directory — never one job per
  file.
* All metadata passes run driver-side over the log only (file counts,
  never row counts); all data passes are DataFrame plans.

Reference scope: the reference gets these guarantees from Kafka compacted
topics + ksqlDB internal state; this module is the lake-side twin.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.window import Window


def _validate_conjuncts(conjuncts: "list[tuple]") -> None:
    ops = {"=", "<", "<=", ">", ">=", "between"}
    for c, op, _ in conjuncts:
        if op not in ops:
            raise ValueError(f"unsupported prune op {op!r} on {c!r}")


# literal forms the mechanical conjunct deriver understands: a signed
# int/float, or a single-quoted string with the '' escape
_PRUNE_LIT = r"-?\d+(?:\.\d+)?|'(?:[^']|'')*'"
_PRUNE_COL = r"[A-Za-z_]\w*|`(?:[^`]|``)+`"


def _prune_lit_value(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    return float(tok) if "." in tok else int(tok)


def _prune_col_name(tok: str) -> str:
    tok = tok.strip()
    if tok.startswith("`"):
        return tok[1:-1].replace("``", "`")
    return tok


def conjuncts_from_condition(condition: str) -> "list[tuple]":
    """Mechanically derive log-stats prune conjuncts from a SQL predicate
    string: the top-level AND conjuncts of the simple shapes
    ``col op literal`` (op in =,<,<=,>,>=) and ``col BETWEEN lit AND
    lit``. Everything else (OR branches, NOT, function calls, casts,
    column-vs-column) contributes nothing — skipping a conjunct only
    loses pruning, never correctness, because every derived conjunct is
    implied by the condition by construction. A TOP-LEVEL ``OR``
    anywhere disables derivation entirely: AND binds tighter than OR,
    so ``a AND b OR c`` is ``(a AND b) OR c`` and NO AND-split part is
    implied by the whole (an unsound conjunct would silently skip files
    the DML must touch). Quote- and paren-aware: ``AND``/``OR`` inside
    a string literal or a parenthesized subexpression is never a
    boundary, and column-name case must match the recorded stats
    exactly (a mismatch just skips that conjunct)."""
    import re as _re

    from data_pipeline_kafka_ek_spark.functions.sqltext import split_top

    # a top-level disjunction poisons every AND-split part: derive nothing
    if len(split_top(condition, "OR")) > 1:
        return []
    parts = split_top(condition, "AND")

    simple = _re.compile(
        rf"^\s*({_PRUNE_COL})\s*(>=|<=|=|<|>)\s*({_PRUNE_LIT})\s*$", _re.S
    )
    out: "list[tuple]" = []
    k = 0
    while k < len(parts):
        part = parts[k]
        m = simple.match(part)
        if m:
            out.append(
                (_prune_col_name(m.group(1)), m.group(2),
                 _prune_lit_value(m.group(3)))
            )
            k += 1
            continue
        # BETWEEN spans two AND-split parts: "col BETWEEN lo" + "hi"
        bm = _re.match(
            rf"^\s*({_PRUNE_COL})\s+BETWEEN\s+({_PRUNE_LIT})\s*$",
            part,
            _re.I | _re.S,
        )
        if bm and k + 1 < len(parts):
            hm = _re.match(rf"^\s*({_PRUNE_LIT})\s*$", parts[k + 1], _re.S)
            if hm:
                out.append(
                    (
                        _prune_col_name(bm.group(1)),
                        "between",
                        (_prune_lit_value(bm.group(2)),
                         _prune_lit_value(hm.group(1))),
                    )
                )
                k += 2
                continue
        k += 1
    return out


def _stats_may_match(add: dict, conjuncts: "list[tuple]") -> bool:
    """Can the file behind ``add`` hold a row satisfying every conjunct,
    judged from its recorded per-column stats? Sound by construction:
    unknown/unrecorded stats answer yes (keep the file); an all-NULL
    column answers no for any comparison (NULL satisfies none of the
    supported ops)."""
    stats = add.get("stats") or {}
    for col, op, val in conjuncts:
        s = stats.get(col)
        if s is None:
            continue  # unknown column stats: cannot rule out
        mn, mx = s.get("min"), s.get("max")
        if mn is None or mx is None:
            # no extremes recorded: either unpruneable (long strings) or
            # the column is all NULL in this file — NULL fails every
            # comparison, so an all-NULL file provably has no match
            if int(s.get("nulls") or 0) == int(add.get("rows") or -1):
                return False
            continue
        try:
            if op == "=" and (val < mn or val > mx):
                return False
            if op == "<" and mn >= val:
                return False
            if op == "<=" and mn > val:
                return False
            if op == ">" and mx <= val:
                return False
            if op == ">=" and mx < val:
                return False
            if op == "between":
                lo, hi = val
                if hi < mn or lo > mx:
                    return False
        except TypeError:
            # value/stat type mismatch (e.g. a string literal compared
            # against numeric stats): cannot rule the file out soundly
            continue
    return True


class ConcurrentModification(Exception):
    """A competing commit removed or rewrote files this merge depends on."""


class ConstraintViolation(Exception):
    """A write contained rows that make a table CHECK constraint FALSE
    (SQL CHECK semantics: NULL passes, only FALSE violates)."""


class CursorAdvanced(ConcurrentModification):
    """The txn high-water mark for the writer's app_id moved past the
    value the writer read its input span against — a concurrent consumer
    of the same app_id already folded (part of) this span, so committing
    would double-apply it. Raised only when the txn dict carries an
    ``expect`` entry (see :meth:`TxnLogTable.merge`); the caller should
    re-read its cursor and restart from the new position."""


def _canon(p: str) -> str:
    """Canonical path form for identity comparisons: the ``file:`` scheme
    is stripped (Hadoop prints ``file:/x``, ``input_file_name`` prints
    ``file:///x`` — same file, three spellings); other schemes pass
    through untouched. Every stored add/remove path and every membership
    check goes through here, so conflict detection and vacuum compare
    exact normalized paths, never suffixes."""
    if p.startswith("file:"):
        rest = p[len("file:"):]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return p


def _canon_uri(p: str) -> str:
    """Canonicalize a path that arrived in URI SPELLING — Hadoop
    ``Path.toString()`` and Spark ``input_file_name()`` percent-encode
    special characters ('sp ace' prints as 'sp%20ace'). Applied exactly
    at those boundaries and nowhere else: stored log paths are the raw
    filesystem spelling, so re-canonicalizing a stored path (plain
    ``_canon``) never double-decodes a file whose literal name contains
    a %XX sequence. Without the decode, a table under any directory with
    an encodable character records unreadable add paths — plain
    ``read()`` dies with PATH_NOT_FOUND on a spelling that is not on
    disk."""
    from urllib.parse import unquote

    return _canon(unquote(p))


def _murmur3_hash_int32(x: int, seed: int = 42) -> int:
    """Murmur3 x86 32-bit of one 4-byte int, exactly as Spark's
    ``Murmur3Hash`` expression computes it for an IntegerType column
    (``hashInt`` with Spark's fixed seed 42) — the hash behind
    ``HashPartitioning``'s ``pmod(hash(col), n)`` routing. Public
    algorithm (Austin Appleby's MurmurHash3, as in Spark's
    ``sql/catalyst`` hash expressions); pinned against ``F.hash`` by
    test_murmur3_preimages_match_spark_hash."""
    mask = 0xFFFFFFFF
    k = (x * 0xCC9E2D51) & mask
    k = ((k << 15) | (k >> 17)) & mask
    k = (k * 0x1B873593) & mask
    h = (seed ^ k) & mask
    h = ((h << 13) | (h >> 19)) & mask
    h = (h * 5 + 0xE6546B64) & mask
    # finalization mix, length = 4 bytes
    h ^= 4
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    # Spark reads the result as a SIGNED 32-bit int
    return h - (1 << 32) if h >= (1 << 31) else h


def _partition_preimages(n: int) -> "list[int]":
    """For each partition id p in [0, n): the smallest non-negative int
    x with ``pmod(murmur3(x), n) == p``. Routing rows through
    ``repartition(n, element_at(<these literals>, pid + 1))`` places a
    row with computed partition id ``pid`` EXACTLY in shuffle partition
    ``pid`` — deterministic range routing with no sampling job and no
    hash-collision skew (guide §2.5's warning about hashing a
    small-cardinality synthetic key does not apply because every bucket
    value routes to its own distinct partition by construction)."""
    out: "list[int | None]" = [None] * n
    found, x = 0, 0
    while found < n:
        p = _murmur3_hash_int32(x) % n  # Python % == pmod for n > 0
        if out[p] is None:
            out[p] = x
            found += 1
        x += 1
    return out  # type: ignore[return-value]


def _stats_range_boundaries(
    sources: "list[tuple]", n_parts: int
) -> "list[float] | None":
    """Equi-depth range boundaries derived from per-source key stats —
    the zero-job replacement for ``repartitionByRange``'s sampling pass
    (r16 deferral #3). ``sources`` is ``[(lo, hi, rows), ...]`` (a
    touched file's non-null key span, or the change set's bounds);
    the key distribution is modeled piecewise-uniform per source and
    the mixture CDF is inverted at i/n quantiles by bisection. The
    boundaries only steer FILE SIZING — bucketing is monotone in the
    key, so files stay key-range disjoint (exact, what stats pruning
    needs) regardless of how good the uniform approximation is.
    Returns ``n_parts - 1`` ascending (possibly repeated) boundaries,
    or None when there is nothing to model."""
    src = [
        (float(lo), float(hi), int(rows))
        for lo, hi, rows in sources
        if lo is not None and hi is not None and rows
    ]
    if not src or n_parts <= 1:
        return None if not src else []
    total = sum(r for _, _, r in src)

    def cdf(x: float) -> float:
        acc = 0.0
        for lo, hi, r in src:
            if x >= hi:
                acc += r
            elif x > lo:
                acc += r * (x - lo) / (hi - lo)
        return acc

    lo_all = min(lo for lo, _, _ in src)
    hi_all = max(hi for _, hi, _ in src)
    bounds: "list[float]" = []
    for i in range(1, n_parts):
        target = total * i / n_parts
        a, b = lo_all, hi_all
        for _ in range(64):
            m = (a + b) / 2
            if cdf(m) < target:
                a = m
            else:
                b = m
        bounds.append((a + b) / 2)
    return bounds


# rows buffered per parquet row group in the fused writer: large enough
# that row-group min/max stats stay useful and dictionary pages amortize,
# small enough that one buffered group never strains executor memory
_FUSED_ROWGROUP_ROWS = 131_072


def _fused_write_partitions(
    clustered: DataFrame, commit_dir: str, key: str, skip_cols: "list[str]"
) -> "list[dict]":
    """The single write+stats job behind ``_write_data_files``: stream
    every partition's Arrow batches into one parquet file while folding
    the file's stats, and return the per-file stat records as the job
    output. Uses ``pyarrow.fs.FileSystem.from_uri`` inside the task so
    the same code path writes file:/, hdfs:/ or s3:/ commit dirs."""
    import pyarrow as pa

    def _write_one_partition(batches):
        import json as _json
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq
        from pyarrow import fs as _pafs
        from pyspark import TaskContext

        fsys, root = _pafs.FileSystem.from_uri(commit_dir)
        writer = None
        tmp = final = None
        buf: list = []
        buffered = 0
        rows = 0
        null_keys = 0
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {c: 0 for c in skip_cols}
        key_lo = key_hi = None

        def _fold(tbl: "_pa.Table") -> None:
            nonlocal rows, null_keys, key_lo, key_hi
            rows += tbl.num_rows
            kc = tbl.column(key)
            null_keys += kc.null_count
            if kc.null_count < len(kc):
                mm = _pc.min_max(kc)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                key_lo = lo if key_lo is None else min(key_lo, lo)
                key_hi = hi if key_hi is None else max(key_hi, hi)
            for c in skip_cols:
                col = tbl.column(c)
                nulls[c] += col.null_count
                if col.null_count < len(col):
                    mm = _pc.min_max(col)
                    lo, hi = mm["min"].as_py(), mm["max"].as_py()
                    mins[c] = lo if c not in mins else min(mins[c], lo)
                    maxs[c] = hi if c not in maxs else max(maxs[c], hi)

        def _flush() -> None:
            nonlocal buf, buffered
            if not buf:
                return
            tbl = _pa.Table.from_batches(buf)
            writer.write_table(tbl)
            _fold(tbl)
            buf, buffered = [], 0

        for batch in batches:
            if batch.num_rows == 0:
                continue
            if writer is None:
                pid = TaskContext.get().partitionId()
                final = f"{root}/part-{pid:05d}.parquet"
                tmp = f"{final}.{_uuid.uuid4().hex}.tmp"
                writer = _pq.ParquetWriter(tmp, batch.schema, filesystem=fsys)
            buf.append(batch)
            buffered += batch.num_rows
            if buffered >= _FUSED_ROWGROUP_ROWS:
                _flush()
        if writer is None:
            return  # empty partition: no file, no stats row
        _flush()
        writer.close()
        # atomic publish of the completed file (rename on local/HDFS);
        # the deterministic final name makes task retries last-wins
        fsys.move(tmp, final)
        size = fsys.get_file_info(final).size
        record = {
            "path": final,
            "min_key": key_lo,
            "max_key": key_hi,
            "rows": rows,
            "null_keys": null_keys,
            "bytes": int(size),
            "stats": {
                c: {
                    # the <=64-char string rule (see caller docstring):
                    # a long extreme records None, never a truncation
                    "min": None
                    if isinstance(mins.get(c), str) and len(mins[c]) > 64
                    else mins.get(c),
                    "max": None
                    if isinstance(maxs.get(c), str) and len(maxs[c]) > 64
                    else maxs.get(c),
                    "nulls": int(nulls[c]),
                }
                for c in skip_cols
            },
        }
        yield _pa.RecordBatch.from_arrays(
            [_pa.array([_json.dumps(record)])], names=["stats"]
        )

    out = clustered.mapInArrow(_write_one_partition, "stats string").collect()
    import json

    return [json.loads(r["stats"]) for r in out]


def _fused_write_commit_partitions(
    clustered: DataFrame,
    commit_dir: str,
    cdc_dir: str,
    key: str,
    skip_cols: "list[str]",
    data_cols: "list[str]",
    cdc_cols: "list[str]",
) -> "tuple[list[dict], list[str]]":
    """The single job behind a change-feed commit's writes: each range
    partition's task streams its Arrow batches ONCE, splitting every
    batch on the ``__ct`` tag — rows with a NULL tag are table data
    (written key-range-clustered into ``commit_dir`` with the same
    stats fold as :func:`_fused_write_partitions`), rows with a tag are
    this commit's change images (written into ``cdc_dir`` with ``__ct``
    restored to CDF's ``_change_type`` name). One row never crosses the
    scratch filesystem twice and the commit pays ONE write job instead
    of the former concurrent pair (max(cdc, data) wall-clock plus two
    scans of the ranked checkpoint). Returns ``(data stat records,
    cdc part-file paths)``; task-retry safety is the same
    deterministic-name + attempt-unique-temp + atomic-move protocol as
    the data-only writer."""
    # cdc columns as they sit in the fused frame: the CDF tag column
    # rides as __ct (a table column legitimately named _change_type
    # would collide inside the union otherwise is not supported today
    # either — _write_cdc appends the same name)
    cdc_in_cols = [c if c != "_change_type" else "__ct" for c in cdc_cols]

    def _write_one_partition(batches):
        import json as _json
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq
        from pyarrow import fs as _pafs
        from pyspark import TaskContext

        dwriter = cwriter = None
        dtmp = dfinal = ctmp = cfinal = None
        dfs = cfs = None
        buf: list = []
        buffered = 0
        rows = 0
        null_keys = 0
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {c: 0 for c in skip_cols}
        key_lo = key_hi = None

        def _fold(tbl: "_pa.Table") -> None:
            nonlocal rows, null_keys, key_lo, key_hi
            rows += tbl.num_rows
            kc = tbl.column(key)
            null_keys += kc.null_count
            if kc.null_count < len(kc):
                mm = _pc.min_max(kc)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                key_lo = lo if key_lo is None else min(key_lo, lo)
                key_hi = hi if key_hi is None else max(key_hi, hi)
            for c in skip_cols:
                col = tbl.column(c)
                nulls[c] += col.null_count
                if col.null_count < len(col):
                    mm = _pc.min_max(col)
                    lo, hi = mm["min"].as_py(), mm["max"].as_py()
                    mins[c] = lo if c not in mins else min(mins[c], lo)
                    maxs[c] = hi if c not in maxs else max(maxs[c], hi)

        def _flush() -> None:
            nonlocal buf, buffered
            if not buf:
                return
            tbl = _pa.concat_tables(buf)
            dwriter.write_table(tbl)
            _fold(tbl)
            buf, buffered = [], 0

        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = _pa.Table.from_batches([batch])
            is_cdc = _pc.is_valid(tbl.column("__ct"))
            dpart = tbl.filter(_pc.invert(is_cdc)).select(data_cols)
            cpart = (
                tbl.filter(is_cdc)
                .select(cdc_in_cols)
                .rename_columns(cdc_cols)
            )
            if dpart.num_rows:
                if dwriter is None:
                    dfs, droot = _pafs.FileSystem.from_uri(commit_dir)
                    pid = TaskContext.get().partitionId()
                    dfinal = f"{droot}/part-{pid:05d}.parquet"
                    dtmp = f"{dfinal}.{_uuid.uuid4().hex}.tmp"
                    dwriter = _pq.ParquetWriter(
                        dtmp, dpart.schema, filesystem=dfs
                    )
                buf.append(dpart)
                buffered += dpart.num_rows
                if buffered >= _FUSED_ROWGROUP_ROWS:
                    _flush()
            if cpart.num_rows:
                if cwriter is None:
                    cfs, croot = _pafs.FileSystem.from_uri(cdc_dir)
                    pid = TaskContext.get().partitionId()
                    cfinal = f"{croot}/part-{pid:05d}.parquet"
                    ctmp = f"{cfinal}.{_uuid.uuid4().hex}.tmp"
                    cwriter = _pq.ParquetWriter(
                        ctmp, cpart.schema, filesystem=cfs
                    )
                cwriter.write_table(cpart)
        out = []
        if dwriter is not None:
            _flush()
            dwriter.close()
            dfs.move(dtmp, dfinal)
            size = dfs.get_file_info(dfinal).size
            out.append(
                {
                    "kind": "add",
                    "path": dfinal,
                    "min_key": key_lo,
                    "max_key": key_hi,
                    "rows": rows,
                    "null_keys": null_keys,
                    "bytes": int(size),
                    "stats": {
                        c: {
                            # <=64-char string rule: a long extreme
                            # records None, never a truncation (see
                            # _write_data_files)
                            "min": None
                            if isinstance(mins.get(c), str)
                            and len(mins[c]) > 64
                            else mins.get(c),
                            "max": None
                            if isinstance(maxs.get(c), str)
                            and len(maxs[c]) > 64
                            else maxs.get(c),
                            "nulls": int(nulls[c]),
                        }
                        for c in skip_cols
                    },
                }
            )
        if cwriter is not None:
            cwriter.close()
            cfs.move(ctmp, cfinal)
            out.append({"kind": "cdc", "path": cfinal})
        if not out:
            return  # empty partition: no files, no records
        yield _pa.RecordBatch.from_arrays(
            [_pa.array([_json.dumps(r) for r in out])], names=["stats"]
        )

    out = clustered.mapInArrow(_write_one_partition, "stats string").collect()
    import json

    return [json.loads(r["stats"]) for r in out]


class TxnLogTable:
    """Delta-style ACID table over parquet + an ordered JSON commit log."""

    # data-skipping stats cover the first N leaf columns (Delta's
    # dataSkippingNumIndexedCols default): bounding the per-add payload
    # keeps the commit log O(files x N), never O(files x width)
    STATS_COLUMNS = 32

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        order_col: str,
        files_per_commit: int = 4,
        checkpoint_interval: int = 10,
        change_feed: bool = False,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = key
        self.order_col = order_col
        self.files_per_commit = files_per_commit
        self.checkpoint_interval = checkpoint_interval
        # change_feed=True makes every MERGE also write row-level change
        # files (pre/post images tagged _change_type) computed from the
        # join the merge already performs; read_changes/read_deltas then
        # replay O(changed rows) for that commit instead of re-emitting
        # every row of the rewritten files. Reading is data-driven (a
        # commit with cdc actions uses them regardless of this flag), so
        # feeds spanning the flag being turned on stay correct.
        self.change_feed = change_feed
        self.log_dir = f"{self.path}/_txn_log"

    # -- Hadoop FS plumbing (works on file:/, HDFS) -------------------------

    def _fs(self, p: str):
        jpath = self.spark._jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _write_text_atomic(self, dest: str, body: str) -> bool:
        """Publish ``body`` at ``dest`` with put-if-absent semantics;
        False = another writer already published this version (the
        optimistic-concurrency signal).

        The body is first written COMPLETELY to a temp file, then made
        visible in one atomic step, so a reader can never observe partial
        content:

        * ``file:`` — POSIX ``link(2)``: creating a hard link fails with
          EEXIST when the destination exists and is atomic. (A plain
          rename is NOT a publish arbiter here: rename(2) silently
          REPLACES an existing destination, so two racers would both
          believe they won.)
        * other schemes — Hadoop ``rename``, which on HDFS is atomic
          server-side and fails when the destination exists. Object
          stores whose rename is copy-or-replace (raw S3A) need an
          external coordination service, exactly as Delta's LogStore
          documents; this module targets posix/HDFS semantics.

        A writer that crashes before the link/rename leaves only an
        orphan temp file (cleaned by :meth:`vacuum`); the version number
        it was attempting stays available, keeping the log dense."""
        fs, dpath = self._fs(dest)
        if fs.exists(dpath):
            return False
        tmp = f"{self.log_dir}/.tmp-{uuid.uuid4().hex}"
        if fs.getUri().getScheme() == "file":
            import errno
            import os as _os

            local_tmp = _canon(tmp)
            local_dst = _canon(dest)
            _os.makedirs(_os.path.dirname(local_tmp), exist_ok=True)
            with open(local_tmp, "w", encoding="utf-8") as fh:
                fh.write(body)
            try:
                _os.link(local_tmp, local_dst)
                ok = True
            except OSError as exc:
                if exc.errno != errno.EEXIST:
                    raise
                ok = False
            _os.unlink(local_tmp)
            return ok
        _, tpath = self._fs(tmp)
        out = fs.create(tpath, False)
        try:
            out.write(bytearray(body.encode("utf-8")))
        finally:
            out.close()
        ok = bool(fs.rename(tpath, dpath))
        if not ok:
            fs.delete(tpath, False)
        return ok

    def _read_text(self, p: str) -> str:
        # py4j cannot fill a Python bytearray in place (readFully mutates
        # only the Java-side copy) — use commons-io to drain the stream
        fs, jpath = self._fs(p)
        stream = fs.open(jpath)
        try:
            return self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    # -- log access ---------------------------------------------------------

    def _log_listing(self) -> "tuple[list[int], list[int]]":
        """One directory listing -> (commit versions, checkpoint versions),
        both sorted. Checkpoints are found from the same listing as the
        commits — there is no mutable pointer file whose half-written
        state a reader could trip over."""
        fs, jpath = self._fs(self.log_dir)
        if not fs.exists(jpath):
            return [], []
        commits, ckpts = [], []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith((".", "_")):
                continue
            if name.endswith(".checkpoint.json"):
                ckpts.append(int(name[: -len(".checkpoint.json")]))
            elif name.endswith(".json"):
                commits.append(int(name[: -len(".json")]))
        return sorted(commits), sorted(ckpts)

    def _list_versions(self) -> "list[int]":
        return self._log_listing()[0]

    def latest_version(self) -> int:
        vs = self._list_versions()
        return vs[-1] if vs else -1

    def _commit_path(self, version: int) -> str:
        return f"{self.log_dir}/{version:020d}.json"

    def _read_commit(self, version: int) -> dict:
        return json.loads(self._read_text(self._commit_path(version)))

    def _read_checkpoint(self, version: int) -> "dict | None":
        """Checkpoint body at ``version``, or None if unreadable — a
        corrupt/in-flight checkpoint only costs replay time, never
        correctness (the caller falls back to a longer log replay)."""
        try:
            return json.loads(
                self._read_text(f"{self.log_dir}/{version:020d}.checkpoint.json")
            )
        except Exception:
            return None

    def _base_checkpoint(self, version: int) -> "tuple[int, dict] | None":
        """Newest readable checkpoint at or before ``version``."""
        _, ckpts = self._log_listing()
        for cv in reversed(ckpts):
            if cv <= version:
                body = self._read_checkpoint(cv)
                if body is not None:
                    return cv, body
        return None

    def _fold_log(self, version: "int | None" = None) -> dict:
        """ONE checkpoint read + ONE tail pass producing the complete
        table state at ``version`` (default: latest): live adds, per-app
        txn high-water marks, and the recorded schema JSON. Every
        metadata consumer (snapshot, schema lookup, txn guard,
        checkpoint writer) goes through this single fold, so a read
        never replays the same tail twice. The log is dense (see
        ``_write_text_atomic``), so a checkpoint at ``c`` covers exactly
        the commits ``0..c`` and the tail replay ``c+1..version`` misses
        nothing."""
        versions = self._list_versions()
        if version is None:
            version = versions[-1] if versions else -1
        live: dict[str, dict] = {}
        txns: dict[str, int] = {}
        schema: "str | None" = None
        constraints: dict[str, str] = {}
        properties: dict[str, str] = {}
        start = 0
        ckpt = self._base_checkpoint(version)
        if ckpt is not None:
            start = ckpt[0] + 1
            live = {a["path"]: a for a in ckpt[1]["adds"]}
            txns = {k: int(v) for k, v in ckpt[1].get("txns", {}).items()}
            schema = ckpt[1].get("schema")
            constraints = dict(ckpt[1].get("constraints", {}))
            properties = dict(ckpt[1].get("properties", {}))
        for v in versions:
            if v < start or v > version:
                continue
            commit = self._read_commit(v)
            for action in commit["actions"]:
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "constraint_add" in action:
                    c = action["constraint_add"]
                    constraints[c["name"]] = c["expr"]
                elif "constraint_drop" in action:
                    constraints.pop(action["constraint_drop"]["name"], None)
                elif "property_set" in action:
                    p = action["property_set"]
                    properties[p["key"]] = p["value"]
                elif "property_unset" in action:
                    properties.pop(action["property_unset"]["key"], None)
            txn = commit.get("txn")
            if txn:
                app = txn["app_id"]
                txns[app] = max(int(txn["batch_id"]), txns.get(app, -1))
            if commit.get("schema") is not None:
                schema = commit["schema"]
        return {
            "adds": live,
            "txns": txns,
            "schema": schema,
            "constraints": constraints,
            "properties": properties,
        }

    def _snapshot_adds(self, version: "int | None" = None) -> "list[dict]":
        """Live add actions at ``version`` (default: latest)."""
        return list(self._fold_log(version)["adds"].values())

    def _commit_mtimes(self) -> "list[tuple[int, float]]":
        """(version, publish-time epoch seconds) per commit, oldest first.
        The authoritative time is the ``ts`` recorded INSIDE the commit
        body at publish (UTC epoch, immune to copy/rsync disturbing file
        mtimes); commits from before that field existed fall back to the
        file mtime from the directory listing. Times are made MONOTONE
        non-decreasing (each stamped at least its predecessor — Delta's
        rule for AS OF resolution), so clock skew between writers can
        never make timestamp travel non-deterministic. Commit bodies are
        immutable, so parsed timestamps are cached per instance — the
        steady-state cost is one listing + the unseen tail."""
        fs, jpath = self._fs(self.log_dir)
        if not fs.exists(jpath):
            return []
        raw = {}
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith((".", "_")) or not name.endswith(".json"):
                continue
            if name.endswith(".checkpoint.json"):
                continue
            raw[int(name[: -len(".json")])] = st.getModificationTime() / 1000.0
        cache = getattr(self, "_commit_ts_cache", None)
        if cache is None:
            cache = self._commit_ts_cache = {}
        out = []
        prev = float("-inf")
        for v in sorted(raw):
            if v not in cache:
                body_ts = self._read_commit(v).get("ts")
                cache[v] = float(body_ts) if body_ts is not None else raw[v]
            prev = max(prev, cache[v])
            out.append((v, prev))
        return out

    def detail(self) -> dict:
        """DESCRIBE DETAIL twin: current snapshot shape from LOG METADATA
        alone (zero data jobs — file and row counts come from the add
        stats every commit records)."""
        state = self._fold_log()
        adds = list(state["adds"].values())
        return {
            "path": self.path,
            "version": self.latest_version(),
            "num_files": len(adds),
            "num_rows": sum(int(a.get("rows") or 0) for a in adds),
            "size_bytes": sum(int(a.get("bytes") or 0) for a in adds),
            "key": self.key,
            "order_col": self.order_col,
            "schema": state["schema"],
            "constraints": dict(state["constraints"]),
            "properties": dict(state["properties"]),
            "change_feed": self.change_feed,
            "vacuum_watermark": self._vacuum_watermark(),
        }

    def version_at(self, timestamp) -> int:
        """AS OF TIMESTAMP resolution: the greatest version published at
        or before ``timestamp`` (epoch seconds, a datetime, or an ISO
        string). Naive datetimes/strings are interpreted as UTC — a
        stated divergence from Delta, which resolves naive timestamps in
        the SESSION timezone: the commit log records publish times as
        epoch seconds, so UTC resolution is identical on every machine
        regardless of the driver's TZ environment; pass an explicit
        offset (``...+05:00``) to resolve in another zone. Resolution reads the publish time recorded
        inside each commit body, so it does not depend on filesystem
        mtimes. Raises if the timestamp predates the table's first
        commit — there is no state to read there."""
        import datetime as _dt

        if isinstance(timestamp, str):
            timestamp = _dt.datetime.fromisoformat(timestamp)
        if isinstance(timestamp, _dt.datetime):
            if timestamp.tzinfo is None:
                timestamp = timestamp.replace(tzinfo=_dt.timezone.utc)
            ts = timestamp.timestamp()
        else:
            ts = float(timestamp)
        candidates = [v for v, t in self._commit_mtimes() if t <= ts]
        if not candidates:
            raise ValueError(
                f"no commit at or before timestamp {timestamp!r} "
                "(the table did not exist yet)"
            )
        return candidates[-1]

    def history(self) -> "list[dict]":
        """Commit metadata, oldest first — op, version, txn, file deltas,
        publish timestamp (monotone, epoch seconds)."""
        mtimes = dict(self._commit_mtimes())
        out = []
        for v in self._list_versions():
            c = self._read_commit(v)
            out.append(
                {
                    "version": v,
                    "op": c["op"],
                    "txn": c.get("txn"),
                    "n_add": sum(1 for a in c["actions"] if "add" in a),
                    "n_remove": sum(1 for a in c["actions"] if "remove" in a),
                    "timestamp": mtimes.get(v),
                }
            )
        return out

    def txn_high_water(self, app_id: str) -> int:
        """Highest committed ``batch_id`` for ``app_id`` (-1 if none).
        Reads ONE checkpoint (which carries per-app high-water marks) plus
        the log tail — O(tail), never O(commits). Doubles as the durable
        CURSOR for incremental consumers that stamp their progress as the
        txn batch id (see ``sources/incremental.py``)."""
        return int(self._fold_log()["txns"].get(app_id, -1))

    def txn_seen(self, app_id: str, batch_id: int) -> bool:
        """Has ``(app_id, batch_id)`` (or a later batch of the same app)
        already committed? The exactly-once guard for replayed batches."""
        return batch_id <= self.txn_high_water(app_id)

    def _latest_schema(self, version: "int | None" = None) -> "StructType | None":
        """Schema recorded at or before ``version`` (checkpoint + tail),
        or None for a never-written table."""
        found = self._fold_log(version)["schema"]
        return StructType.fromJson(json.loads(found)) if found else None

    # -- data-file writing --------------------------------------------------

    def _stats_boundaries_for(
        self, df: DataFrame, n_files: int, range_sources
    ) -> "list | None":
        """Driver-derived range boundaries for a commit write, or None
        to fall back to ``repartitionByRange``'s sampling job.
        ``range_sources`` is the caller's zero-cost knowledge of the
        incoming key distribution — the touched files' recorded
        (min_key, max_key, rows) stats plus the change set's bounds+count
        (already computed for file pruning) — so deriving the boundaries
        costs NO job. Only numeric keys interpolate; anything else keeps
        the sampled path (string quantiles cannot be modeled from
        min/max)."""
        if range_sources is None or n_files <= 1:
            return None
        t = df.schema[self.key].dataType.simpleString()
        if t not in (
            "tinyint", "smallint", "int", "bigint", "float", "double"
        ):
            return None
        bounds = _stats_range_boundaries(range_sources, n_files)
        if bounds is None:
            return None
        if t in ("tinyint", "smallint", "int", "bigint"):
            import math

            bounds = [int(math.floor(b)) for b in bounds]
        return bounds

    def _cluster_by_key(
        self, df: DataFrame, n_files: int, cluster, boundaries
    ) -> DataFrame:
        """Key-range clustering for a commit write. With driver-derived
        ``boundaries`` (see ``_stats_boundaries_for``) the partition id
        is a pure row-local expression — count of boundaries below the
        key, NULLs first like ``repartitionByRange`` — routed EXACTLY to
        its shuffle partition via the murmur3 preimage literals
        (``_partition_preimages``), killing the extra range-sampling job
        per write (guide §2.4; r16 deferral #3). Bucketing stays
        monotone in the key either way, so the written files are
        key-range DISJOINT exactly as before — stats-pruning correctness
        never depends on how well the boundaries balance file sizes.
        Without boundaries: the classic sampled range partitioning."""
        if boundaries is None:
            return df.repartitionByRange(
                n_files, cluster
            ).sortWithinPartitions(cluster)
        n = len(boundaries) + 1
        pid = None
        for b in boundaries:
            term = (cluster > F.lit(b)).cast("int")
            pid = term if pid is None else pid + term
        pid = F.coalesce(pid, F.lit(0)) if pid is not None else F.lit(0)
        route = F.element_at(
            F.array(*[F.lit(x) for x in _partition_preimages(n)]),
            pid + 1,
        )
        return df.repartition(n, route).sortWithinPartitions(cluster)

    def _write_data_files(
        self, df: DataFrame, cluster_expr=None, n_files: "int | None" = None,
        range_sources=None,
    ) -> "list[dict]":
        """Write ``df`` key-range clustered into a fresh immutable commit
        directory; return add actions carrying per-file [min,max] key
        stats (what MERGE prunes on) plus the file's on-disk ``bytes``
        (what size-targeted compaction bins on).

        ONE PASS, ONE JOB (r15 verdict #4): the write and the stats are
        the SAME job — ``mapInArrow`` streams each range partition
        through a pyarrow ``ParquetWriter`` (one file per non-empty
        partition, named by partition id) while folding min/max/null
        counts over the Arrow batches it writes, and the job's OUTPUT is
        the per-file stats row. The previous shape wrote via Spark's
        writer and then re-read the whole commit directory in a second
        job grouped by ``input_file_name()`` — the data crossed the
        scratch filesystem twice per commit, which the io canary showed
        dominating the commit-COUNT-bound feed benchmarks. This is the
        same design point as Delta's writer-side stats collection:
        statistics are a byproduct of the write, never a rescan.

        Task-retry safety: the final file name is a pure function of the
        partition id inside a fresh-UUID commit dir; each attempt writes
        an attempt-unique temp file and moves it into place (atomic
        rename on local/HDFS — on object stores the move is copy+delete,
        acceptable because the dir is unreferenced until the commit
        publishes and partition contents are deterministic). Spark
        surfaces only the committed attempt's output rows, so stats are
        never duplicated. Empty partitions write nothing and yield
        nothing — exactly the files a snapshot should not reference.

        ``cluster_expr`` overrides the default key-range clustering
        (used by Z-order optimize); files are additionally sorted within
        partitions on the cluster expression so parquet row-group
        min/max stats stay tight. ``n_files`` overrides the table's
        ``files_per_commit`` (used by size-targeted compaction to emit
        ~target-size outputs)."""
        commit_dir = f"{self.path}/files/c-{uuid.uuid4().hex}"
        cluster = cluster_expr if cluster_expr is not None else F.col(self.key)
        boundaries = (
            self._stats_boundaries_for(
                df, n_files or self.files_per_commit, range_sources
            )
            if cluster_expr is None
            else None
        )
        clustered = self._cluster_by_key(
            df, n_files or self.files_per_commit, cluster, boundaries
        )
        # __zorder_* are clustering scaffolding (bucket ids + z-value),
        # projected away after the range partition + sort consumed them —
        # they never land in the data files
        clustered = clustered.drop(
            *[c for c in clustered.columns if c.startswith("__zorder_")]
        )
        # per-column data-skipping stats (Delta's dataSkipping rule):
        # min/max/null-count for the first STATS_COLUMNS leaf columns of
        # integral/floating/string type. Strings are recorded only when
        # both extremes are short (<= 64 chars) — a truncated max
        # understates the file's upper bound and would prune files that
        # DO match, so long-string columns record None (= never pruned
        # on) instead of lying. JSON-storable by construction.
        skip_cols = [
            fld.name
            for fld in clustered.schema.fields[: self.STATS_COLUMNS]
            if fld.dataType.simpleString().split("(")[0]
            in ("tinyint", "smallint", "int", "bigint", "float", "double",
                "string")
        ]
        fs, jdir = self._fs(commit_dir)
        fs.mkdirs(jdir)
        key = self.key
        records = _fused_write_partitions(
            clustered, commit_dir, key, skip_cols
        )
        return [
            {
                "path": _canon_uri(r["path"]),
                "min_key": r["min_key"],
                "max_key": r["max_key"],
                "rows": r["rows"],
                "null_keys": r["null_keys"],
                "bytes": r["bytes"],
                "stats": r["stats"],
            }
            for r in sorted(records, key=lambda r: r["path"])
        ]

    def _widened_schema_json(
        self, prev_json: "str | None", df_schema: StructType
    ) -> str:
        """Schema evolution only WIDENS (Delta's mergeSchema rule): the
        recorded table schema after a commit is the previous recorded
        schema plus any genuinely new columns of the batch, never the
        batch schema verbatim. Recording a narrow batch's schema as-is
        silently NARROWS the table — and because merge/optimize read
        touched/live files under the recorded schema, the next rewrite
        physically destroys every row's values in the dropped column
        (found by the r10 ACID history fuzz: a non-evolved append after
        an evolved merge erased the evolved column from unrelated keys).
        Names match by exact string. There is NO type evolution: a batch
        whose same-named column carries a DIFFERENT type is rejected
        before any data file lands — silently accepting it would write
        files the recorded schema cannot read back (the vectorized
        parquet reader errors on a long file read as int), i.e. a
        poisoned table. NullType (uncast ``lit(None)``) columns never
        reach this check: ``_align_void_columns`` casts them to the
        recorded type first (parquet would otherwise store them as
        BOOLEAN — unreadable under any real type)."""
        if not prev_json:
            return df_schema.json()
        prev = StructType.fromJson(json.loads(prev_json))
        by_name = {f.name: f for f in prev.fields}
        conflicts = [
            (f.name, by_name[f.name].dataType.simpleString(),
             f.dataType.simpleString())
            for f in df_schema.fields
            if f.name in by_name
            # simpleString comparison: nullability-insensitive (nested
            # containsNull/valueContainsNull flags differ harmlessly
            # between createDataFrame and parquet round-trips)
            and f.dataType.simpleString()
            != by_name[f.name].dataType.simpleString()
        ]
        if conflicts:
            detail = ", ".join(
                f"{n!r} is {old}, batch has {new}" for n, old, new in conflicts
            )
            raise ValueError(
                f"batch column type conflicts with the recorded table "
                f"schema ({detail}); schema evolution adds columns, never "
                "changes a column's type"
            )
        extra = [f for f in df_schema.fields if f.name not in by_name]
        if not extra:
            # keep the stored json verbatim: stable schema-epoch keys for
            # the feeds (a byte-identical epoch groups into one scan)
            return prev_json
        return StructType(list(prev.fields) + extra).json()

    def _align_void_columns(
        self, df: DataFrame, schema_json: "str | None"
    ) -> DataFrame:
        """Cast NullType (uncast ``lit(None)``) batch columns to the
        RECORDED type — parquet stores a void column as BOOLEAN, which no
        real type can read back, so left alone it poisons the file. A
        void column the table does not know is rejected outright: there
        is no type to land it as."""
        voids = [
            f.name for f in df.schema.fields if f.dataType.typeName() == "void"
        ]
        if not voids:
            return df
        recorded = (
            {
                f.name: f.dataType
                for f in StructType.fromJson(json.loads(schema_json)).fields
            }
            if schema_json
            else {}
        )
        unknown = sorted(set(voids) - set(recorded))
        if unknown:
            raise ValueError(
                f"column(s) {unknown} are untyped NULL (void) and not in "
                "the table schema — cast them to a concrete type "
                "(F.lit(None).cast(...))"
            )
        for c in voids:
            df = df.withColumn(c, F.col(c).cast(recorded[c]))
        return df

    def _try_commit(
        self,
        version: int,
        op: str,
        actions: "list[dict]",
        txn: "dict | None",
        schema: "str | None" = None,
    ) -> bool:
        if txn is not None and "expect" in txn:
            # ``expect`` is the caller's compare-and-set input, not part of
            # the durable txn action — strip it from the committed body
            txn = {k: v for k, v in txn.items() if k != "expect"}
        body = json.dumps(
            {
                "version": version,
                "op": op,
                "actions": actions,
                "txn": txn,
                "schema": schema,
                # in-commit publish time (UTC epoch): AS OF resolution and
                # history() read THIS, not the commit file's mtime, so
                # copying/rsyncing a table does not rewrite its timeline
                # (Delta's in-commit-timestamp rule). Legacy commits
                # without it fall back to mtime in _commit_mtimes.
                "ts": round(time.time(), 6),
            }
        )
        ok = self._write_text_atomic(self._commit_path(version), body)
        if ok and version % self.checkpoint_interval == 0 and version > 0:
            self._write_checkpoint(version)
        return ok

    def _write_checkpoint(self, version: int) -> None:
        """Materialize the full state at ``version``: live adds, per-app
        txn high-water marks, current schema. The log is dense, so every
        commit ``<= version`` is published at this point and the fold
        misses nothing. Content is a pure function of the immutable
        commits ``0..version`` — two writers racing the same checkpoint
        produce identical bodies and put-if-absent keeps one."""
        state = self._fold_log(version)
        self._write_text_atomic(
            f"{self.log_dir}/{version:020d}.checkpoint.json",
            json.dumps(
                {
                    "version": version,
                    "adds": list(state["adds"].values()),
                    "txns": state["txns"],
                    "schema": state["schema"],
                    "constraints": state["constraints"],
                    "properties": state["properties"],
                }
            ),
        )

    # -- public write ops ---------------------------------------------------

    def initialize(self, schema: StructType) -> int:
        """CTAS on a new/empty path: publish a data-free ``create`` commit
        carrying the schema, so ``read()`` of the empty table returns an
        empty DataFrame of the right shape instead of raising. No-op if
        the table already has commits."""
        v = self.latest_version()
        if v >= 0:
            return v
        if self._try_commit(0, "create", [], None, schema.json()):
            return 0
        return self.latest_version()

    def record_txn(
        self,
        app_id: str,
        batch_id: int,
        max_retries: int = 20,
        expect: "int | None" = None,
    ) -> int:
        """Publish a data-free commit carrying only a ``(app_id,
        batch_id)`` txn action — how an incremental consumer advances its
        durable cursor over a source span that produced no rows to write
        (e.g. only optimize/create commits). Idempotent: an
        already-recorded (or later) batch id is a no-op. ``expect`` is a
        compare-and-set on the app's current high-water mark (same
        contract as :meth:`merge`): raise :class:`CursorAdvanced` when a
        concurrent consumer of the same app_id moved it first."""
        if self.txn_seen(app_id, batch_id):
            return self.latest_version()
        txn = {"app_id": app_id, "batch_id": int(batch_id)}
        for _ in range(max_retries):
            base = self.latest_version()
            if expect is not None:
                hw = int(
                    self._fold_log(base if base >= 0 else None)["txns"].get(
                        app_id, -1
                    )
                )
                if hw != int(expect):
                    raise CursorAdvanced(
                        f"txn cursor for {app_id!r} advanced to {hw} "
                        f"(expected {expect})"
                    )
            v = base + 1
            if self._try_commit(v, "txn", [], txn):
                return v
            if self.txn_seen(app_id, batch_id):
                return self.latest_version()
        raise ConcurrentModification(
            f"record_txn lost the commit race {max_retries} times"
        )

    # -- CHECK constraints ----------------------------------------------------

    def constraints(self) -> "dict[str, str]":
        """Active CHECK constraints (name -> SQL expression)."""
        return dict(self._fold_log()["constraints"])

    def add_constraint(
        self, name: str, expr: str, max_retries: int = 20
    ) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (expr): refuses if any
        EXISTING row violates the expression (one aggregate pass — the
        Delta rule: a constraint is only ever true of the whole table),
        then publishes a data-free ``alter`` commit. Every subsequent
        append/merge/update validates its written rows in one aggregate
        job and raises :class:`ConstraintViolation` instead of
        committing. SQL CHECK semantics: NULL passes, only FALSE
        violates.

        Commit-time conflict rule: the validated snapshot is PINNED to a
        version, and the alter commits only directly on top of it —
        winning the publish race at ``validated + 1`` proves (dense log)
        that no write interleaved between the scan and the alter. If the
        table advanced, the whole current snapshot is re-validated and
        the commit re-attempted; a racing writer can therefore never land
        rows the new constraint has not seen (Delta's metadata-conflict
        rule, mirrored from the writer side in append/merge)."""
        validated = None  # version whose full row set passed the check
        for _ in range(max_retries):
            base = self.latest_version()
            if base != validated and base >= 0:
                self._enforce_constraints(
                    self.read(version=base), {name: expr}, "existing rows"
                )
            validated = base
            if self._try_commit(
                base + 1, "alter",
                [{"constraint_add": {"name": name, "expr": expr}}],
                None,
            ):
                return base + 1
        raise ConcurrentModification(
            f"add_constraint lost the commit race {max_retries} times"
        )

    def add_columns(self, coldefs, max_retries: int = 20) -> int:
        """ALTER TABLE ADD COLUMNS (Delta's explicit schema-evolution
        DDL): publish a data-free ``alter`` commit carrying the widened
        schema. Existing data files stay untouched — readers project the
        new columns as NULL (the same narrow-file rule appended narrow
        batches rely on), so the op is O(log), never O(table). Raises if
        a named column already exists (a typo must never silently no-op
        — the mirror of the INSERT unknown-column guard) or if the table
        has no recorded schema yet. ``coldefs`` is a StructType or Spark
        DDL text ("y DOUBLE, z STRING")."""
        frag = (
            StructType.fromDDL(coldefs)
            if isinstance(coldefs, str)
            else coldefs
        )
        for _ in range(max_retries):
            base = self.latest_version()
            state = self._fold_log(base) if base >= 0 else {"schema": None}
            if not state["schema"]:
                raise ValueError(
                    "ADD COLUMNS needs a recorded schema — initialize() "
                    "or write data first"
                )
            cur = StructType.fromJson(json.loads(state["schema"]))
            # case-INSENSITIVE duplicate check: Spark resolves
            # identifiers case-insensitively by default, so admitting a
            # case-variant duplicate (k + K) would make every subsequent
            # reference ambiguous — a bricked table
            have = {f.name.lower() for f in cur.fields}
            dup = sorted(
                f.name for f in frag.fields if f.name.lower() in have
            )
            if dup:
                raise ValueError(
                    f"ADD COLUMNS: column(s) {dup} already exist in the "
                    "recorded schema"
                )
            widened = StructType(list(cur.fields) + list(frag.fields))
            if self._try_commit(base + 1, "alter", [], None, widened.json()):
                return base + 1
        raise ConcurrentModification(
            f"add_columns lost the commit race {max_retries} times"
        )

    def properties(self) -> "dict[str, str]":
        """Active table properties (key -> value), folded through the
        log and checkpoints like constraints."""
        return dict(self._fold_log()["properties"])

    def set_property(
        self, key: str, value: str, max_retries: int = 20
    ) -> int:
        """ALTER TABLE SET TBLPROPERTIES: data-free ``alter`` commit.
        Properties are plain strings; the two the engine itself reads:

        * ``zorder.columns`` — comma-separated column list; a plain
          ``optimize()`` with no ``cluster_by`` re-clusters on it, so a
          table's chosen layout sticks across maintenance runs instead
          of living in whichever cron job remembered the argument.
        * ``auto_optimize.file_threshold`` — integer; after a
          successful append/merge whose snapshot exceeds this many live
          files, a best-effort compaction runs inline (lost races are
          swallowed — the next write retries it). Bounds the
          fragmentation a continuous-merge workload accumulates without
          an external maintenance scheduler."""
        for _ in range(max_retries):
            v = self.latest_version() + 1
            if self._try_commit(
                v, "alter",
                [{"property_set": {"key": str(key), "value": str(value)}}],
                None,
            ):
                return v
        raise ConcurrentModification(
            f"set_property lost the commit race {max_retries} times"
        )

    def unset_property(self, key: str, max_retries: int = 20) -> int:
        """ALTER TABLE UNSET TBLPROPERTIES: data-free ``alter`` commit."""
        for _ in range(max_retries):
            v = self.latest_version() + 1
            if self._try_commit(
                v, "alter", [{"property_unset": {"key": str(key)}}], None
            ):
                return v
        raise ConcurrentModification(
            f"unset_property lost the commit race {max_retries} times"
        )

    def drop_constraint(self, name: str, max_retries: int = 20) -> int:
        """ALTER TABLE DROP CONSTRAINT: data-free ``alter`` commit."""
        for _ in range(max_retries):
            v = self.latest_version() + 1
            if self._try_commit(
                v, "alter", [{"constraint_drop": {"name": name}}], None
            ):
                return v
        raise ConcurrentModification(
            f"drop_constraint lost the commit race {max_retries} times"
        )

    def _enforce_constraints(
        self,
        df: DataFrame,
        constraints: "dict[str, str]",
        what: str,
        schema_json: "str | None" = None,
    ) -> None:
        """ONE aggregate job counts FALSE rows for every constraint at
        once over the write set; raises :class:`ConstraintViolation`
        naming each violated constraint with its row count. Columns the
        batch lacks (narrow batch after evolution) surface as NULL —
        they land NULL on disk, and CHECK-NULL passes."""
        if not constraints:
            return
        if schema_json:
            recorded = StructType.fromJson(json.loads(schema_json))
            for f in recorded.fields:
                if f.name not in df.columns:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        aggs = [
            F.sum(
                F.when(F.expr(e) == F.lit(False), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(n)
            for n, e in sorted(constraints.items())
        ]
        row = df.agg(*aggs).collect()[0]
        bad = {n: int(row[n]) for n in sorted(constraints) if row[n]}
        if bad:
            detail = ", ".join(
                f"{n!r} ({constraints[n]}): {c} row(s)" for n, c in bad.items()
            )
            raise ConstraintViolation(
                f"CHECK constraint(s) violated by {what}: {detail}"
            )

    def _maybe_auto_optimize(self) -> None:
        """Best-effort inline compaction after a write: fires only when
        the ``auto_optimize.file_threshold`` property is set and the
        live file count exceeds it — and always through the SIZE-TARGETED
        bin-packed variant, so an inline trigger after an append/merge
        rewrites only the small-file debt (O(small files)), never the
        whole table. ``auto_optimize.target_file_bytes`` (default 128
        MiB) sets the bin target; files at or above half the target are
        never rewritten inline. Never raises — a lost race or a
        malformed threshold leaves compaction to the next write (the
        data is already safely committed)."""
        try:
            state = self._fold_log()
            props = state["properties"]
            thr = props.get("auto_optimize.file_threshold")
            if not thr or len(state["adds"]) <= int(thr):
                return
            tgt = int(
                props.get("auto_optimize.target_file_bytes")
                or 128 * 1024 * 1024
            )
            # pre-check the candidate set from the state already in hand:
            # a snapshot whose files are all at/above the floor can sit
            # above the threshold forever (bounded compaction can't shrink
            # full-size files, by design) — skip the no-op optimize() so
            # every subsequent write pays ONE log fold, not two
            small = [
                a
                for a in state["adds"].values()
                if int(a.get("bytes") or 0) < tgt // 2
            ]
            if len(small) < 2:
                return
            self.optimize(target_file_bytes=tgt)
        except Exception:
            # the data commit already published — ANY compaction failure
            # (lost race, malformed threshold, Spark/IO error) must not
            # surface as a write failure; the next write retries
            pass

    def append(
        self,
        df: DataFrame,
        txn: "dict | None" = None,
        max_retries: int = 20,
    ) -> int:
        """Blind append: new files only, conflicts never destroy work —
        on a version race the writer re-reads the log and retries the
        commit (the data files are already safely in place). The txn
        guard re-checks after every lost race so a duplicate replay that
        wins the race is detected, not doubled."""
        if txn is not None and self.txn_seen(txn["app_id"], txn["batch_id"]):
            return self.latest_version()
        base0 = self.latest_version()
        st0 = self._fold_log(base0) if base0 >= 0 else None
        df = self._align_void_columns(df, st0["schema"] if st0 else None)
        checked: dict = {}
        if st0 is not None:
            if st0["constraints"]:
                # pin the rows: the CHECK aggregate and the data-file write
                # are two evaluations of this plan — a non-deterministic
                # input (rand(), a re-read of a moving source) must not
                # pass the check and then write different rows
                df = df.localCheckpoint(eager=True)
            self._enforce_constraints(
                df, st0["constraints"], "append batch", st0["schema"]
            )
            checked = dict(st0["constraints"])
            # fail type conflicts BEFORE any data file lands (the in-loop
            # widen would refuse the commit anyway, but only after
            # writing orphan files for vacuum to sweep)
            self._widened_schema_json(st0["schema"], df.schema)
        adds = self._write_data_files(df)
        actions = [{"add": a} for a in adds]
        for _ in range(max_retries):
            base = self.latest_version()
            state = self._fold_log(base) if base >= 0 else None
            prev = state["schema"] if state else None
            # a constraint added between the validated snapshot and this
            # commit base must hold for the batch too (Delta's metadata-
            # conflict rule): validate the delta against the WRITTEN
            # files — exactly the rows being committed, immune to a
            # non-deterministic source
            if state is not None:
                fresh = {
                    n: e
                    for n, e in state["constraints"].items()
                    if checked.get(n) != e
                }
                if fresh and adds:
                    written = self.spark.read.schema(df.schema).parquet(
                        *[a["path"] for a in adds]
                    )
                    self._enforce_constraints(
                        written, fresh,
                        "append batch (constraint added concurrently)",
                        state["schema"],
                    )
                checked.update(fresh)
            # widen, never narrow: an append whose batch lacks an evolved
            # column must not drop that column from the recorded schema
            schema = self._widened_schema_json(prev, df.schema)
            if self._try_commit(base + 1, "append", actions, txn, schema):
                self._maybe_auto_optimize()
                return base + 1
            if txn is not None and self.txn_seen(txn["app_id"], txn["batch_id"]):
                return self.latest_version()
        raise ConcurrentModification(
            f"append lost the commit race {max_retries} times"
        )

    def merge(
        self,
        changes: DataFrame,
        delete_col: "str | None" = None,
        txn: "dict | None" = None,
        max_retries: int = 5,
        changes_stable: bool = False,
    ) -> int:
        """Upsert (and optionally delete) by key — the MERGE statement's
        semantics: latest row per key wins by ``order_col`` (changes beat
        existing rows on ties; two CHANGE rows tying on both key and
        ``order_col`` are an input-contract violation — the winner among
        them is arbitrary, same caveat as any CDC apply, so feed batches
        with a strictly ordered ``order_col`` per key). Only files whose
        [min,max] key range overlaps the incoming keys are rewritten
        (stats pruning). Losing the publish race re-runs conflict
        detection against the PUBLISHED winner — the log has no
        claimed-but-unpublished state, so the check can never pass
        spuriously while a slow competitor is still in flight: if the
        winner removed a file this merge read, ``ConcurrentModification``
        is raised; otherwise the whole merge re-runs on the new
        snapshot."""
        if txn is not None and self.txn_seen(txn["app_id"], txn["batch_id"]):
            return self.latest_version()
        base0 = self.latest_version()
        st0 = self._fold_log(base0) if base0 >= 0 else None
        changes = self._align_void_columns(
            changes, st0["schema"] if st0 else None
        )
        # the change set is consumed by several jobs (bounds, constraint
        # check, the rewrite union, cdc writes): checkpoint ONCE so a
        # non-deterministic input (rand(), a re-read of a moving source)
        # cannot pass one evaluation and write different rows in the
        # next. ``changes_stable=True`` is the caller's contract that
        # the frame is deterministic and cheap to recompute (the common
        # feed shape: a filter over an already-checkpointed batch) — the
        # defensive checkpoint is then a pure fixed cost per commit and
        # is skipped (Delta's MERGE makes the same assumption about its
        # source by default).
        if not changes_stable:
            changes = changes.localCheckpoint(eager=True)
        to_check = changes
        if delete_col is not None and delete_col in changes.columns:
            # tombstones delete rows — their payload values never
            # land, so CHECK does not apply to them
            to_check = changes.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            )
        checked: dict = {}
        if st0 is not None:
            # clean type-conflict refusal up front: without it the
            # union/rank below surfaces as an opaque runtime CAST error
            # (or worse, a silent coercion) deep inside the merge plan
            self._widened_schema_json(st0["schema"], changes.schema)
            if st0["constraints"]:
                self._enforce_constraints(
                    to_check, st0["constraints"], "merge change set",
                    st0["schema"],
                )
            checked = dict(st0["constraints"])
        bounds = changes.agg(
            F.min(self.key).alias("lo"),
            F.max(self.key).alias("hi"),
            # min/max skip NULLs: a NULL merge key is a KEY (groupBy/window
            # semantics), not an absence — track it separately so an
            # all-NULL change set is not mistaken for an empty one
            F.max(F.col(self.key).isNull().cast("int")).alias("has_null"),
            # row count rides the same job: with the touched files'
            # recorded key stats it models the merged key distribution,
            # so the data write derives its range boundaries driver-side
            # instead of paying repartitionByRange's sampling job
            F.count(F.lit(1)).alias("n_changes"),
        ).collect()[0]
        null_changes = bool(bounds["has_null"])
        if bounds["lo"] is None and not null_changes:
            # empty change set: no data to write, but a caller that passed
            # txn semantics still needs its cursor advanced — silently
            # dropping the txn action strands the cursor forever (an
            # incremental consumer re-reads the same span every refresh,
            # and once vacuum moves the watermark past the stranded cursor
            # every refresh raises). record_txn carries the same
            # compare-and-set contract (``expect``) as the merge itself.
            if txn is not None:
                self.record_txn(
                    txn["app_id"], txn["batch_id"], expect=txn.get("expect")
                )
            return self.latest_version()

        def _overlaps(a: dict) -> bool:
            """A live file is touched if its non-NULL key range overlaps
            the change bounds, or if both sides carry NULL keys. None
            guards: a file of only-NULL keys has no range (legacy adds
            without the null_keys stat conservatively count as
            NULL-carrying)."""
            if (
                a["min_key"] is not None
                and bounds["lo"] is not None
                and not (a["max_key"] < bounds["lo"] or a["min_key"] > bounds["hi"])
            ):
                return True
            return null_changes and int(a.get("null_keys", 1) or 0) > 0

        for attempt in range(max_retries):
            if (
                attempt > 0
                and txn is not None
                and self.txn_seen(txn["app_id"], txn["batch_id"])
            ):
                return self.latest_version()
            base_version = self.latest_version()
            state = self._fold_log(base_version if base_version >= 0 else None)
            # a constraint added since the snapshot this merge validated
            # against must hold for the change set too — winning the CAS
            # at base_version + 1 proves (dense log) the fold here is the
            # commit's direct parent, so nothing can slip between
            fresh_c = {
                n: e
                for n, e in state["constraints"].items()
                if checked.get(n) != e
            }
            if fresh_c:
                self._enforce_constraints(
                    to_check, fresh_c,
                    "merge change set (constraint added concurrently)",
                    state["schema"],
                )
                checked.update(fresh_c)
            # compare-and-set on the txn cursor: when the caller read its
            # input span at high-water ``expect``, any OTHER writer of the
            # same app_id landing first makes this merge a double-apply.
            # The check runs against the same fold the commit attempt is
            # based on, and a lost publish race loops back here — so the
            # guard is atomic with the put-if-absent publish itself.
            if txn is not None and txn.get("expect") is not None:
                hw = int(state["txns"].get(txn["app_id"], -1))
                if hw != int(txn["expect"]):
                    raise CursorAdvanced(
                        f"txn cursor for {txn['app_id']!r} advanced to {hw} "
                        f"(expected {txn['expect']}): a concurrent consumer "
                        "already folded this span"
                    )
            live = list(state["adds"].values())
            base_schema = (
                StructType.fromJson(json.loads(state["schema"]))
                if state["schema"]
                else None
            )
            touched = [a for a in live if _overlaps(a)]
            # zero-job key-distribution model for the data write's range
            # boundaries: every touched file's recorded non-null key span
            # + the change set's bounds and count (all already in hand)
            range_sources = [
                (
                    a["min_key"],
                    a["max_key"],
                    int(a["rows"]) - int(a.get("null_keys") or 0),
                )
                for a in touched
            ] + [(bounds["lo"], bounds["hi"], int(bounds["n_changes"]))]
            if touched:
                # read touched files under the RECORDED schema, not footer
                # inference: after schema evolution the touched set can mix
                # pre- and post-widening files, and an arbitrary narrow
                # footer would silently drop the evolved column from the
                # rewrite (permanent column loss once vacuum reclaims the
                # wide originals)
                reader = (
                    self.spark.read.schema(base_schema)
                    if base_schema is not None
                    else self.spark.read
                )
                old = reader.parquet(*[a["path"] for a in touched])
                # keep rows of untouched keys verbatim; merge the rest.
                # eqNullSafe: plain equality never matches NULL = NULL, so
                # a NULL-key upsert would both keep the old row (anti-join
                # passes it) AND write the new one — a duplicate per merge
                keys = changes.select(F.col(self.key).alias("__mk")).distinct()
                match = F.col(self.key).eqNullSafe(F.col("__mk"))
                untouched_rows = old.join(keys, match, "left_anti")
                contested_src = old.join(keys, match, "left_semi")
            else:
                untouched_rows = None
                contested_src = None
            ranked = changes.withColumn("__src", F.lit(1))
            tomb_added = False
            if contested_src is not None:
                base_side = contested_src
                if delete_col is not None and delete_col not in base_side.columns:
                    # stored rows carry no tombstone column: align schemas
                    base_side = base_side.withColumn(delete_col, F.lit(False))
                    tomb_added = True
                # allowMissingColumns = schema evolution: a change set
                # with NEW columns widens the table (old rows read NULL);
                # a change row MISSING a column upserts NULL there — the
                # row image IS the change (CDC post-image semantics)
                ranked = base_side.withColumn("__src", F.lit(0)).unionByName(
                    ranked, allowMissingColumns=True
                )
            w = Window.partitionBy(self.key).orderBy(
                F.desc(self.order_col), F.desc("__src")
            )
            # ONE eager checkpoint of the ranked contested∪changes frame
            # replaces the former two (contested, then winners on top of
            # it — two sequential materialization jobs per commit): every
            # consumer — the winner rows feeding the data write, the
            # contested pre-images and old-count info feeding the change
            # files, and both passes of the data write's range exchange —
            # is now a FILTER over this one materialization, so the
            # touched-file scan, the broadcast semi-join and the rank
            # window each run exactly once per commit (guide §2.4).
            # Untouched keys' rows never enter the window (the broadcast
            # anti-join keeps them on the scan side), so the rank shuffle
            # stays O(changed rows) at scale exactly as before. The
            # checkpoint also pins the row_number assignment, so winner
            # choice among exact (key, order_col, __src) ties is decided
            # once and every consumer sees the same decision.
            ranked = ranked.withColumn(
                "__rn", F.row_number().over(w)
            ).localCheckpoint(eager=True)
            winners = ranked.filter(F.col("__rn") == 1).drop("__rn")
            merged = winners.drop("__src")
            if delete_col is not None:
                merged = merged.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
                merged = merged.drop(delete_col)
                if untouched_rows is not None and delete_col in untouched_rows.columns:
                    untouched_rows = untouched_rows.drop(delete_col)
            if untouched_rows is not None:
                merged = merged.unionByName(untouched_rows, allowMissingColumns=True)
            if self.change_feed:
                cdc_files, adds = self._write_fused_commit_files(
                    merged,
                    self._change_frames(
                        ranked, delete_col, tomb_added,
                        contested_src is not None,
                    ),
                    range_sources=range_sources,
                )
            else:
                cdc_files = []
                adds = self._write_data_files(
                    merged, range_sources=range_sources
                )
            actions = (
                [{"add": a} for a in adds]
                + [{"remove": {"path": a["path"]}} for a in touched]
                + [{"cdc": {"path": p}} for p in cdc_files]
            )
            if self._try_commit(
                base_version + 1,
                "merge",
                actions,
                txn,
                # widen, never narrow: a merge whose touched set missed the
                # wide files (or touched nothing) must not drop evolved
                # columns from the recorded schema
                self._widened_schema_json(state["schema"], merged.schema),
            ):
                self._maybe_auto_optimize()
                return base_version + 1
            # lost the publish race: the winner IS published (dense log),
            # so this check is against real state, never an in-flight claim
            now_live = {a["path"] for a in self._snapshot_adds()}
            if any(a["path"] not in now_live for a in touched):
                raise ConcurrentModification(
                    "a competing commit rewrote files this merge read"
                )
            # winner was a blind append elsewhere — re-run on new snapshot
        raise ConcurrentModification(
            f"merge lost the commit race {max_retries} times"
        )

    @staticmethod
    def _canon_path_col():
        """input_file_name() in stored-path spelling: percent-decoded
        (path semantics — '+' preserved) and scheme-stripped, the same
        normalization ``_canon_uri`` applies driver-side."""
        return F.regexp_replace(
            F.coalesce(
                F.try_url_decode(
                    F.regexp_replace(F.input_file_name(), r"\+", "%2B")
                ),
                F.input_file_name(),
            ),
            "^file:/+",
            "/",
        )

    def delete_where(
        self,
        condition,
        txn: "dict | None" = None,
        max_retries: int = 5,
        prune: "list[tuple] | None" = None,
    ) -> "int | None":
        """Predicate DELETE (the lakehouse ``DELETE FROM t WHERE ...``):
        rewrite ONLY the files that contain matching rows, keeping their
        non-matching rows verbatim. SQL NULL semantics: rows where the
        predicate is NULL are KEPT (only TRUE deletes). Returns the new
        version, or None when nothing matched (no commit — and a
        provided txn cursor still advances via a data-free commit).
        File discovery is one filter-pushdown scan — parquet footer
        min/max stats skip whole files/row-groups, so a predicate
        aligned with the clustering (merge key, or any OPTIMIZE ZORDER
        BY dimension) touches only the files it must. With
        ``change_feed=True`` the commit records row-level ``delete``
        images, so feeds and replicas move O(deleted rows). Concurrency:
        same optimistic rule as MERGE.

        Log-stats file pruning is AUTOMATIC for string conditions: the
        simple top-level ``col op literal`` / ``col BETWEEN a AND b``
        conjuncts of the predicate text are derived mechanically
        (:func:`conjuncts_from_condition` — implied by the condition by
        construction) and shrink the hit-scan's file list before any
        task is scheduled (see :meth:`prune_files`). At 100k+ files
        this is the difference between scheduling a scan task per file
        and touching only the clustered slice the DELETE names.
        ``prune`` remains only as an ADVANCED supplement for Column
        conditions or conjuncts the deriver cannot see; any caller-
        supplied conjunct must be IMPLIED by ``condition`` — an
        unsound one silently keeps matching rows."""
        return self._rewrite_where(
            "delete", condition, None, txn, max_retries, prune
        )

    def update_where(
        self,
        condition,
        assignments: dict,
        txn: "dict | None" = None,
        max_retries: int = 5,
        prune: "list[tuple] | None" = None,
    ) -> "int | None":
        """Predicate UPDATE (``UPDATE t SET c = expr WHERE ...``):
        rewrite only the files containing matching rows, applying
        ``assignments`` (column -> Column | SQL string | literal) to the
        matches and keeping everything else verbatim. Assignments must
        target EXISTING columns — UPDATE never evolves the schema.
        NULL-predicate rows are untouched (only TRUE updates). Returns
        the new version, or None when nothing matched. With
        ``change_feed=True`` the commit records ``update_preimage`` /
        ``update_postimage`` row images. Same pruning and concurrency
        shape as :meth:`delete_where`: string conditions derive their
        log-stats prune conjuncts automatically; ``prune`` is the same
        advanced implied-by-condition supplement."""
        if not assignments:
            raise ValueError("update_where needs at least one assignment")
        return self._rewrite_where(
            "update", condition, assignments, txn, max_retries, prune
        )

    def _rewrite_where(
        self, op, condition, assignments, txn, max_retries, prune=None
    ) -> "int | None":
        cond = F.expr(condition) if isinstance(condition, str) else condition
        if prune is not None:
            _validate_conjuncts(prune)
        if isinstance(condition, str):
            # mechanical derivation from the predicate text: simple
            # top-level AND conjuncts are implied by the condition by
            # construction, so string-condition DML (including the SQL
            # surface) always file-prunes without any caller contract
            derived = conjuncts_from_condition(condition)
            if derived:
                prune = derived + list(prune or [])
        if txn is not None and self.txn_seen(txn["app_id"], txn["batch_id"]):
            return self.latest_version()
        for attempt in range(max_retries):
            if (
                attempt > 0
                and txn is not None
                and self.txn_seen(txn["app_id"], txn["batch_id"])
            ):
                return self.latest_version()
            base_version = self.latest_version()
            if base_version < 0:
                return None
            state = self._fold_log(base_version)
            # same compare-and-set contract as merge: a caller that read
            # its input at cursor ``expect`` must not double-apply after
            # a concurrent consumer of the same app_id advanced it
            if txn is not None and txn.get("expect") is not None:
                hw = int(state["txns"].get(txn["app_id"], -1))
                if hw != int(txn["expect"]):
                    raise CursorAdvanced(
                        f"txn cursor for {txn['app_id']!r} advanced to "
                        f"{hw} (expected {txn['expect']})"
                    )
            live = list(state["adds"].values())
            if prune is not None:
                # log-stats file skipping BEFORE the hit-scan: the
                # caller promised the conjuncts are implied by the
                # condition, so files they rule out cannot hold a match
                live = [a for a in live if _stats_may_match(a, prune)]
            if not live:
                if txn is not None:
                    self.record_txn(
                        txn["app_id"], txn["batch_id"],
                        expect=txn.get("expect"),
                    )
                return None
            sch = (
                StructType.fromJson(json.loads(state["schema"]))
                if state["schema"]
                else None
            )
            if assignments is not None:
                cols = (
                    [f.name for f in sch.fields]
                    if sch is not None
                    else None
                )
                if cols is not None:
                    unknown = sorted(set(assignments) - set(cols))
                    if unknown:
                        raise ValueError(
                            f"UPDATE assigns unknown columns {unknown} "
                            "(assignments must target existing columns)"
                        )
            reader = (
                self.spark.read.schema(sch)
                if sch is not None
                else self.spark.read
            )
            # ONE pushdown scan finds the files that hold matches —
            # parquet footer stats prune files/row-groups before any row
            # is read, so a clustered predicate touches few files
            match = F.coalesce(cond.cast("boolean"), F.lit(False))
            hit = {
                r["__path"]
                for r in reader.parquet(*[a["path"] for a in live])
                .filter(match)
                .select(self._canon_path_col().alias("__path"))
                .distinct()
                .collect()
            }
            if not hit:
                if txn is not None:
                    self.record_txn(
                        txn["app_id"], txn["batch_id"],
                        expect=txn.get("expect"),
                    )
                return None
            touched = [a for a in live if a["path"] in hit]
            old = reader.parquet(*[a["path"] for a in touched])
            if self.change_feed:
                old = old.localCheckpoint(eager=True)
            kept = old.filter(~match)
            if assignments is None:
                new_df = kept
                matched = old.filter(match)
                cdc_frames = (
                    [matched.withColumn("_change_type", F.lit("delete"))]
                    if self.change_feed
                    else []
                )
            else:
                matched = old.filter(match)
                # ALL right-hand sides evaluate against the OLD row (one
                # select, never chained withColumn): SQL UPDATE semantics
                # — {"x": col("y"), "y": col("x")} swaps, an assignment
                # never observes another assignment's new value
                from pyspark.sql import Column as _Col

                def _as_expr(v):
                    if isinstance(v, _Col):
                        return v
                    return F.expr(v) if isinstance(v, str) else F.lit(v)

                updated = matched.select(
                    *[
                        _as_expr(assignments[c]).alias(c)
                        if c in assignments
                        else F.col(c)
                        for c in matched.columns
                    ]
                )
                # an assignment of an uncast NULL lands as the recorded type
                updated = self._align_void_columns(updated, state["schema"])
                self._enforce_constraints(
                    updated, state["constraints"], "updated rows",
                    state["schema"],
                )
                new_df = kept.unionByName(updated)
                cdc_frames = (
                    [
                        matched.withColumn(
                            "_change_type", F.lit("update_preimage")
                        ),
                        updated.withColumn(
                            "_change_type", F.lit("update_postimage")
                        ),
                    ]
                    if self.change_feed
                    else []
                )
            # the rewrite keeps/updates rows of exactly the touched
            # files: their recorded key stats model the write's key
            # distribution with no extra job
            range_sources = [
                (
                    a["min_key"],
                    a["max_key"],
                    int(a["rows"]) - int(a.get("null_keys") or 0),
                )
                for a in touched
            ]
            if cdc_frames:
                cdc_files, adds = self._write_fused_commit_files(
                    new_df, cdc_frames, range_sources=range_sources
                )
            else:
                cdc_files = []
                adds = self._write_data_files(
                    new_df, range_sources=range_sources
                )
            actions = (
                [{"add": a} for a in adds]
                + [{"remove": {"path": a["path"]}} for a in touched]
                + [{"cdc": {"path": p}} for p in cdc_files]
            )
            if self._try_commit(
                base_version + 1,
                op,
                actions,
                txn,
                self._widened_schema_json(state["schema"], new_df.schema),
            ):
                return base_version + 1
            now_live = {a["path"] for a in self._snapshot_adds()}
            if any(a["path"] not in now_live for a in touched):
                raise ConcurrentModification(
                    f"a competing commit rewrote files this {op} read"
                )
        raise ConcurrentModification(
            f"{op} lost the commit race {max_retries} times"
        )

    def _change_frames(
        self,
        ranked: DataFrame,
        delete_col: "str | None",
        tomb_added: bool,
        has_contested: bool,
    ) -> "list[DataFrame]":
        """Materialize this merge's ROW-LEVEL change images (Delta CDF's
        ``_change_type`` convention: insert / update_preimage /
        update_postimage / delete) from the checkpointed ranked
        contested∪changes frame. Only keys whose table state actually
        moves appear: keys the change set won, plus keys whose stored
        duplicates collapse (a blind-append table can hold several rows
        per key; the merge keeps one winner, so ALL stored rows are the
        pre-image even when the winner is stored). A key whose single
        stored row out-ordered the change contributes nothing, and the
        untouched rows of rewritten files never enter the frame — so
        the files are O(changed rows), the
        property that lets a merge touching 1% of a file's rows move 1%
        of the rows through a downstream incremental refresh.

        Shape: ONE ``Window.partitionBy(key)`` over the ranked
        checkpoint computes everything the classification needs as
        per-group flags — ``__oldn`` (stored-row count: a key moves
        materially when the change set won it OR its duplicates
        collapse), the winner's source side and tombstone — and the
        four image types are plain filters over that. The former shape
        derived the same answers through a groupBy + three joins
        (old-count left join for the post images, two semi-joins keying
        the pre-images/deletes), whose initial plan carried the
        aggregate three times and planned one semi-join as a
        SortMergeJoin with two extra O(changed rows) exchanges because
        the checkpointed build side has no size statistics; the window
        form needs exactly one exchange, reused across the union's
        branches. Row multiset proven identical against the old shape
        on the sf0.1 feed commit before the swap. Returns the
        ``_change_type``-tagged frames; the fused commit writer
        (``_write_fused_commit_files``) rides them through the data
        write's range exchange and materializes them alongside the
        data files in one job."""
        k = self.key
        tomb = (
            F.coalesce(F.col(delete_col), F.lit(False))
            if delete_col is not None
            else F.lit(False)
        )
        win = Window.partitionBy(k)
        def _winner(attr):
            # exactly one __rn==1 row per group: max() over the
            # when-guarded expression (NULL for non-winners — when
            # without otherwise) reads the winner's attribute from
            # every row of its group, with no dependence on arithmetic
            # NULL propagation (r16 ADVICE: the former one_win * attr
            # form silently misclassifies if attr ever becomes nullable)
            return F.max(F.when(F.col("__rn") == 1, attr)).over(win)

        aug = (
            ranked.withColumn(
                "__oldn",
                F.sum(
                    F.when(F.col("__src") == 0, F.lit(1)).otherwise(F.lit(0))
                ).over(win),
            )
            .withColumn("__wsrc", _winner(F.col("__src")))
            .withColumn("__wgone", _winner(tomb.cast("int")))
        )
        material = (F.col("__wsrc") == 1) | (F.col("__oldn") > 1)
        meta_cols = ["__rn", "__src", "__oldn", "__wsrc", "__wgone"]
        # post images carry the winner row WITHOUT the tombstone column
        # (it is consumed into the delete classification); pre-images
        # must carry exactly the stored rows' columns, so they strip it
        # only when the schema alignment added it (a genuinely stored
        # column of that name stays, as it always did)
        post_drop = meta_cols + ([delete_col] if delete_col is not None else [])
        post = aug.filter(
            (F.col("__rn") == 1) & material & (F.col("__wgone") == 0)
        )
        parts = [
            post.filter(F.col("__oldn") == 0)
            .drop(*post_drop)
            .withColumn("_change_type", F.lit("insert")),
            post.filter(F.col("__oldn") > 0)
            .drop(*post_drop)
            .withColumn("_change_type", F.lit("update_postimage")),
        ]
        if has_contested:
            pre_drop = meta_cols + ([delete_col] if tomb_added else [])
            # any stored (__src==0) row implies __oldn >= 1, so the old
            # shape's `__oldn > 0` key conditions are implied here
            stored = aug.filter((F.col("__src") == 0) & material)
            parts.append(
                stored.filter(F.col("__wgone") == 0)
                .drop(*pre_drop)
                .withColumn("_change_type", F.lit("update_preimage"))
            )
            parts.append(
                stored.filter(F.col("__wgone") == 1)
                .drop(*pre_drop)
                .withColumn("_change_type", F.lit("delete"))
            )
        return parts

    def _write_fused_commit_files(
        self, data_df: DataFrame, cdc_frames: "list[DataFrame]",
        range_sources=None,
    ) -> "tuple[list[str], list[dict]]":
        """Write a change-feed commit's data files AND change files in
        ONE Spark job (guide §2.4 — the r16 deferral #1): the cdc union
        rides the data frame through the SAME key-range exchange, tagged
        by ``__ct`` (NULL = table data, else the CDF ``_change_type``),
        and each range partition's task splits its batches into the two
        parquet writers (:func:`_fused_write_commit_partitions`). The
        former shape ran the two writes as concurrent jobs — the commit
        paid max(cdc, data) wall-clock plus a second scan of the ranked
        checkpoint and a separate coalesce exchange for the cdc rows.
        Row multisets of both outputs are unchanged: the data rows are
        exactly ``data_df`` (the __ct filter is a partition-local split,
        order within a sorted partition preserved), the change rows are
        exactly the ``_write_cdc`` union. Change files now land
        key-range-partitioned (<= files_per_commit, one per non-empty
        partition) instead of coalesced — readers consume change rows as
        a multiset, so the file-count shape is free to follow the data
        write's. Returns ``(cdc part paths, add actions)``."""
        cdc = cdc_frames[0]
        for p in cdc_frames[1:]:
            cdc = cdc.unionByName(p, allowMissingColumns=True)
        data_cols = list(data_df.columns)
        cdc_cols = list(cdc.columns)
        fused = data_df.unionByName(
            cdc.withColumnRenamed("_change_type", "__ct"),
            allowMissingColumns=True,
        )
        commit_dir = f"{self.path}/files/c-{uuid.uuid4().hex}"
        cdc_dir = f"{self.path}/changes/c-{uuid.uuid4().hex}"
        boundaries = self._stats_boundaries_for(
            data_df, self.files_per_commit, range_sources
        )
        clustered = self._cluster_by_key(
            fused, self.files_per_commit, F.col(self.key), boundaries
        )
        # per-column data-skipping stats over the DATA columns (same
        # rule as _write_data_files; the fused frame's extra cdc-only
        # columns sit past the data prefix and never enter the stats)
        skip_cols = [
            fld.name
            for fld in data_df.schema.fields[: self.STATS_COLUMNS]
            if fld.dataType.simpleString().split("(")[0]
            in ("tinyint", "smallint", "int", "bigint", "float", "double",
                "string")
        ]
        fs, jdir = self._fs(commit_dir)
        fs.mkdirs(jdir)
        cfs, cjdir = self._fs(cdc_dir)
        cfs.mkdirs(cjdir)
        records = _fused_write_commit_partitions(
            clustered, commit_dir, cdc_dir, self.key, skip_cols,
            data_cols, cdc_cols,
        )
        adds = [
            {
                "path": _canon_uri(r["path"]),
                "min_key": r["min_key"],
                "max_key": r["max_key"],
                "rows": r["rows"],
                "null_keys": r["null_keys"],
                "bytes": r["bytes"],
                "stats": r["stats"],
            }
            for r in records
            if r["kind"] == "add"
        ]
        cdc_paths = sorted(
            _canon_uri(r["path"]) for r in records if r["kind"] == "cdc"
        )
        if not cdc_paths:
            # a change-feed commit ALWAYS records change files, even when
            # this merge produced zero change rows (every change row lost
            # to a stored winner): downstream cursors read "cdc actions
            # present, zero rows" as a replayable empty span, while a
            # commit with NO cdc actions is indistinguishable from a
            # legacy pre-change-feed merge — the typed feed's fidelity
            # guard refuses those. One empty file, written driver-side
            # (no job; the rare shape never occurs on row-moving commits).
            import pyarrow.parquet as _pq
            from pyarrow import fs as _pafs
            from pyspark.sql.pandas.types import to_arrow_schema

            fsys, root = _pafs.FileSystem.from_uri(cdc_dir)
            p = f"{root}/part-00000.parquet"
            _pq.write_table(
                to_arrow_schema(cdc.schema).empty_table(), p, filesystem=fsys
            )
            cdc_paths = [_canon_uri(p)]
        return cdc_paths, sorted(adds, key=lambda a: a["path"])

    def _write_cdc(self, frames: "list[DataFrame]") -> "list[str]":
        """Union ``_change_type``-tagged frames and materialize them as
        this commit's change files; returns the part-file paths (stored
        as ``cdc`` actions; attempt files orphaned by a lost commit race
        are swept by vacuum's change-file pass)."""
        out = frames[0]
        for p in frames[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        cdc_dir = f"{self.path}/changes/c-{uuid.uuid4().hex}"
        out.coalesce(self.files_per_commit).write.mode("overwrite").parquet(
            cdc_dir
        )
        fs, jdir = self._fs(cdc_dir)
        paths = []
        it = fs.listFiles(jdir, False)
        while it.hasNext():
            st = it.next()
            p = _canon_uri(st.getPath().toString())
            if p.rsplit("/", 1)[-1].startswith("part-"):
                paths.append(p)
        return sorted(paths)

    def _with_zvalue(
        self, df: DataFrame, cols: "list[str]", bits: int = 6
    ) -> DataFrame:
        """Attach the Z-ORDER clustering key as ``__zorder_z``: per-column
        bucket ids (``2**bits`` buckets each) with their bits interleaved
        — the multi-dimensional locality key OPTIMIZE clusters files by,
        so parquet footer min/max stats stay tight on EVERY listed
        dimension at once (a single-dimension range clustering leaves
        every other dimension's per-file range full-width, so filters on
        those dimensions prune nothing).

        Bucketing per column: numeric/date/timestamp columns are rank-
        bucketed against ``approxQuantile`` boundaries collected in ONE
        cheap driver-side pass (boundaries ride into the expression as
        codegen literals — no join, no window); other types hash-bucket
        via xxhash64, which clusters equal values for equality pruning
        but carries no range locality. NULL sorts to bucket 0. Bucket ids
        are STAGED as ``__zorder_b{i}`` columns so the interleave terms
        reference named columns — inlining the bucket chain into all
        ``bits × dims`` terms blows past janino's method-size limit and
        forces interpreted evaluation. Everything is deterministic and
        shuffle-free; ``__zorder_*`` columns are dropped by the writer
        after clustering."""
        n_buckets = 1 << bits
        numeric_like = (
            "byte", "short", "int", "bigint", "long", "float", "double",
            "decimal", "date", "timestamp", "timestamp_ntz",
        )
        names = []
        for i, c in enumerate(cols):
            dt = dict(df.dtypes)[c]
            base = dt.split("(")[0]
            if base in numeric_like:
                as_num = F.col(c).cast("double")
                probs = [j / n_buckets for j in range(1, n_buckets)]
                bounds = df.select(as_num.alias("__q")).stat.approxQuantile(
                    "__q", probs, 0.01
                )
                # strictly increasing boundaries only: constant/skewed
                # columns collapse duplicates (fewer effective buckets)
                uniq = []
                for b in bounds:
                    if b is not None and (not uniq or b > uniq[-1]):
                        uniq.append(b)
                bucket = F.lit(0)
                for b in uniq:
                    bucket = bucket + (as_num > F.lit(b)).cast("int")
                bucket = F.coalesce(bucket, F.lit(0))
            else:
                bucket = F.coalesce(
                    F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets)),
                    F.lit(0),
                ).cast("int")
            name = f"__zorder_b{i}"
            df = df.withColumn(name, bucket.cast("long"))
            names.append(name)
        z = F.lit(0).cast("long")
        for bit in range(bits):
            for i, name in enumerate(names):
                pos = bit * len(names) + i
                z = z + F.shiftleft(
                    F.shiftright(F.col(name), bit) % 2, pos
                )
        return df.withColumn("__zorder_z", z)

    def optimize(
        self,
        min_files: int = 2,
        max_retries: int = 5,
        cluster_by: "list[str] | None" = None,
        target_file_bytes: "int | None" = None,
        min_file_bytes: "int | None" = None,
        max_rewrite_bytes: "int | None" = None,
    ) -> "int | None":
        """Compaction: rewrite the CURRENT live file set into
        ``files_per_commit`` key-range-clustered files as one
        transactional commit (op ``optimize``: adds the compacted files,
        removes every prior live file; row content is untouched). This is
        the maintenance op continuous streaming MERGE makes necessary —
        every micro-batch adds files, so fragmentation grows without
        bound and with it both scan task count and stats-pruning
        selectivity (many overlapping [min,max] ranges). Returns the new
        version, or None when the live file count is already at or below
        ``max(min_files, files_per_commit)`` (compacting again would just
        rewrite the same files). Concurrency: same optimistic
        rule as MERGE — losing the publish race to a commit that removed
        a source file raises ``ConcurrentModification``; losing to a
        blind append re-runs on the new snapshot.

        ``cluster_by=[c1, c2, ...]`` is OPTIMIZE ZORDER BY: the rewrite
        clusters files on the interleaved-bit z-value of the listed
        columns (see :meth:`_zvalue_expr`) instead of the merge key's
        range, so parquet min/max footer stats stay tight on every
        listed dimension and a filter on ANY of them skips whole
        files/row-groups at scan time — the layout a 100 TB fact needs
        when queries slice on more than one column. Trade-off, recorded
        deliberately: per-file ranges of the MERGE key widen (the add
        stats still record them truthfully), so z-order favors read
        pruning over merge rewrite pruning; re-cluster requests run even
        when the file count is already compact (the point is layout, not
        file count).

        ``target_file_bytes`` switches on SIZE-TARGETED BIN-PACKED
        compaction (Delta OPTIMIZE semantics — the mode a 100 TB table
        needs): only live files SMALLER than ``min_file_bytes`` (default
        ``target_file_bytes // 2``) are selected, smallest first, up to
        the optional ``max_rewrite_bytes`` budget, and rewritten into
        ``ceil(selected_bytes / target_file_bytes)`` outputs. Files
        already at or above the floor are NEVER touched — the rewrite is
        O(small-file debt), not O(table) — and fewer than two candidates
        is a no-op. Adds from before byte tracking (no recorded size)
        count as candidates with size 0 so legacy fragmentation still
        compacts. ``cluster_by`` composes: the selected bin is laid out
        on the z-value, untouched files keep their layout."""
        for _ in range(max_retries):
            base_version = self.latest_version()
            if base_version < 0:
                return None
            state = self._fold_log(base_version)
            live = list(state["adds"].values())
            if not live:
                return None
            if cluster_by is None and state["properties"].get("zorder.columns"):
                # the table's recorded layout choice sticks across plain
                # maintenance runs (see set_property)
                cluster_by = [
                    c.strip()
                    for c in state["properties"]["zorder.columns"].split(",")
                    if c.strip()
                ]
            if (
                target_file_bytes is None
                and min_file_bytes is None
                and state["properties"].get("optimize.target_file_bytes")
            ):
                # recorded size policy: a plain optimize()/OPTIMIZE
                # statement on a table that declared its target file
                # size runs the bounded bin-packed pass, same as the
                # zorder.columns layout property above
                target_file_bytes = int(
                    state["properties"]["optimize.target_file_bytes"]
                )
            size_targeted = (
                target_file_bytes is not None or min_file_bytes is not None
            )
            if size_targeted:
                tgt = target_file_bytes or 128 * 1024 * 1024
                floor = min_file_bytes if min_file_bytes is not None else tgt // 2
                rewrite = sorted(
                    (a for a in live if int(a.get("bytes") or 0) < floor),
                    key=lambda a: int(a.get("bytes") or 0),
                )
                if max_rewrite_bytes is not None:
                    picked, budget = [], 0
                    for a in rewrite:
                        b = int(a.get("bytes") or 0)
                        if picked and budget + b > max_rewrite_bytes:
                            break
                        picked.append(a)
                        budget += b
                    rewrite = picked
                if len(rewrite) < 2:
                    return None
                total = sum(int(a.get("bytes") or 0) for a in rewrite)
                n_out = max(1, -(-total // tgt))
            else:
                if cluster_by is None and len(live) <= max(
                    min_files, self.files_per_commit
                ):
                    return None
                rewrite = live
                n_out = None
            # recorded schema pins the compaction read — same evolution
            # hazard as merge: a mixed narrow/wide live set read via footer
            # inference would rewrite (and record) the narrow schema
            sch = (
                StructType.fromJson(json.loads(state["schema"]))
                if state["schema"]
                else None
            )
            reader = self.spark.read.schema(sch) if sch is not None else self.spark.read
            df = reader.parquet(*[a["path"] for a in rewrite])
            # the recorded schema must never include __zorder_* scaffolding
            commit_schema = df.schema.json()
            cluster_expr = None
            if cluster_by is not None:
                df = self._with_zvalue(df, cluster_by)
                cluster_expr = F.col("__zorder_z")
            adds = self._write_data_files(
                df, cluster_expr=cluster_expr, n_files=n_out
            )
            actions = [{"add": a} for a in adds] + [
                {"remove": {"path": a["path"]}} for a in rewrite
            ]
            if self._try_commit(
                base_version + 1, "optimize", actions, None, commit_schema
            ):
                return base_version + 1
            now_live = {a["path"] for a in self._snapshot_adds()}
            if any(a["path"] not in now_live for a in rewrite):
                raise ConcurrentModification(
                    "a competing commit rewrote files this optimize read"
                )
        raise ConcurrentModification(
            f"optimize lost the commit race {max_retries} times"
        )

    def restore(
        self,
        version: "int | None" = None,
        timestamp=None,
        max_retries: int = 5,
    ) -> "int | None":
        """RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF (Delta parity):
        publish ONE commit that makes the current snapshot equal the
        snapshot at the target version — the undo for a bad DML/merge.
        Data files are immutable, so the commit is pure metadata at the
        file level: re-add the target's files that are no longer live,
        remove the live files the target did not have. The RECORDED
        SCHEMA reverts too (restore is the one op exempt from the
        widen-never-narrow rule — reverting an evolution is its point).
        Returns the new version, or None when the target IS the current
        snapshot. Raises for a future version or one below the vacuum
        watermark (its files may be reclaimed). History stays intact:
        this is a new commit on top, so the bad span remains
        time-travelable and the restore itself is auditable (op
        ``restore``).

        With ``change_feed=True`` the commit also records row-level
        change images so replicas/feeds follow the revert at O(changed
        rows): a keyed diff of the two snapshots (full outer join on the
        merge key over the UNION of both schemas' columns, missing
        columns read as the NULL they become) emits ``insert`` for keys
        only in the target, ``delete`` for keys only in the current
        snapshot, and ``update_preimage``/``update_postimage`` for keys
        whose row differs — the same image vocabulary MERGE writes, so
        every consumer (typed feed, signed deltas, TableReplicator,
        replicate_stream) works unchanged. The diff describes the
        LATEST-ROW-PER-KEY view of each snapshot (exact for unique-key
        tables — the invariant merge-maintained tables keep; a dup-key
        blind-append table replicates as its keyed view, the typed
        feed's documented contract). Without change_feed the restore
        commit is file-level only, and the typed feed refuses the span
        (same fidelity rule as a cdc-less merge). Known race, shared
        with every lakehouse: a vacuum running CONCURRENTLY with a
        restore to a near-watermark version can reclaim a file the
        restore re-references — schedule maintenance ops apart."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        if version is None:
            raise ValueError("restore needs a version or timestamp")
        for _ in range(max_retries):
            base = self.latest_version()
            if version > base:
                raise ValueError(
                    f"cannot restore to version {version} (latest {base})"
                )
            wm = self._vacuum_watermark()
            if version < wm:
                raise ValueError(
                    f"version {version} was vacuumed (earliest retained: "
                    f"{wm})"
                )
            if version == base:
                return None
            cur_state = self._fold_log(base)
            tgt_state = self._fold_log(version)
            cur_adds = cur_state["adds"]
            tgt_adds = tgt_state["adds"]
            if set(cur_adds) == set(tgt_adds):
                return None  # intervening commits were data-free
            actions = [
                {"add": a} for p, a in tgt_adds.items() if p not in cur_adds
            ] + [
                {"remove": {"path": p}}
                for p in cur_adds
                if p not in tgt_adds
            ]
            cdc_files: "list[str]" = []
            if self.change_feed:
                frames = self._restore_change_frames(
                    cur_state, tgt_state, base, version
                )
                if frames:
                    cdc_files = self._write_cdc(frames)
                    actions += [{"cdc": {"path": p}} for p in cdc_files]
            if self._try_commit(
                base + 1, "restore", actions, None, tgt_state["schema"]
            ):
                return base + 1
            # lost the publish race: recompute the whole diff against the
            # new head (the winner changed what "current" means)
        raise ConcurrentModification(
            f"restore lost the commit race {max_retries} times"
        )

    def _restore_change_frames(
        self, cur_state: dict, tgt_state: dict, base: int, version: int
    ) -> "list[DataFrame]":
        """Row-level images for a restore commit: keyed diff of the
        current snapshot against the target snapshot (see
        :meth:`restore`). One full-outer join on the merge key; row
        equality is NULL-safe over the union of both schemas' columns."""

        def _snap(state):
            adds = list(state["adds"].values())
            sch = (
                StructType.fromJson(json.loads(state["schema"]))
                if state["schema"]
                else None
            )
            if not adds:
                return (
                    self.spark.createDataFrame([], sch)
                    if sch is not None
                    else None
                )
            reader = (
                self.spark.read.schema(sch)
                if sch is not None
                else self.spark.read
            )
            return reader.parquet(*[a["path"] for a in adds])

        cur = _snap(cur_state)
        tgt = _snap(tgt_state)
        if cur is None and tgt is None:
            return []
        if cur is None:
            return [tgt.withColumn("_change_type", F.lit("insert"))]
        if tgt is None:
            return [cur.withColumn("_change_type", F.lit("delete"))]
        # union of columns, in a stable order; missing columns read NULL
        # of the OTHER side's recorded type
        all_cols = list(
            dict.fromkeys(list(tgt.columns) + list(cur.columns))
        )
        types = {f.name: f.dataType for f in tgt.schema.fields}
        for f in cur.schema.fields:
            types.setdefault(f.name, f.dataType)

        def _aligned(df):
            out = df
            for c in all_cols:
                if c not in df.columns:
                    out = out.withColumn(c, F.lit(None).cast(types[c]))
            return out.select(*all_cols)

        def _latest(df):
            w = Window.partitionBy(self.key).orderBy(F.desc(self.order_col))
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )

        t = _latest(_aligned(tgt))
        c = _latest(_aligned(cur))
        # presence must be decided by something that cannot be NULL in a
        # present row — the key can (NULL keys are keys here). Wrap each
        # side's whole row as a struct: a full-outer miss leaves the
        # struct itself NULL, a present row never does
        joined = (
            t.select(F.struct(*[F.col(col) for col in all_cols]).alias("tr"))
            .join(
                c.select(
                    F.struct(*[F.col(col) for col in all_cols]).alias("cr")
                ),
                F.col(f"tr.{self.key}").eqNullSafe(F.col(f"cr.{self.key}")),
                "full_outer",
            )
            # the four image frames below each filter this join — pin it
            # once instead of re-running two snapshot scans per frame
            .localCheckpoint(eager=True)
        )
        differs = ~F.col("tr").eqNullSafe(F.col("cr"))
        inserts = (
            joined.filter(F.col("cr").isNull() & F.col("tr").isNotNull())
            .select("tr.*")
            .withColumn("_change_type", F.lit("insert"))
        )
        deletes = (
            joined.filter(F.col("tr").isNull() & F.col("cr").isNotNull())
            .select("cr.*")
            .withColumn("_change_type", F.lit("delete"))
        )
        both = joined.filter(
            F.col("tr").isNotNull() & F.col("cr").isNotNull() & differs
        )
        pre = both.select("cr.*").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = both.select("tr.*").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        frames = [inserts, deletes, pre, post]
        return frames

    # -- read ops -----------------------------------------------------------

    def _vacuum_watermark(self) -> int:
        """Lowest version whose snapshot is still fully on disk (0 if no
        vacuum ever ran). Unreadable marker degrades to 0 — reads below a
        lost watermark fail at scan time instead of cleanly, never
        silently succeed with wrong data."""
        marker = f"{self.log_dir}/_vacuum_watermark"
        fs, jpath = self._fs(marker)
        try:
            if not fs.exists(jpath):
                return 0
            return int(json.loads(self._read_text(marker))["min_version"])
        except Exception:
            return 0

    def read(
        self, version: "int | None" = None, timestamp=None
    ) -> DataFrame:
        """Snapshot read (time travel with ``version=k`` or AS OF
        ``timestamp`` — epoch seconds, datetime, or ISO string, resolved
        to the greatest version published at or before it). The file list
        is pinned here — later commits can't tear this DataFrame. A valid
        but empty snapshot (freshly created table, or every row deleted)
        returns an empty DataFrame with the recorded schema; only a table
        with no commits at all raises."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        latest = self.latest_version()
        if latest < 0:
            raise ValueError("table has no commits")
        effective = latest if version is None else version
        if effective > latest:
            raise ValueError(f"version {effective} does not exist (latest {latest})")
        wm = self._vacuum_watermark()
        if effective < wm:
            raise ValueError(
                f"version {effective} was vacuumed (earliest retained: {wm})"
            )
        # fold at the PINNED version just validated — folding at None would
        # re-list and could observe a newer latest than the one checked
        state = self._fold_log(effective)  # ONE checkpoint + tail pass
        adds = list(state["adds"].values())
        schema = (
            StructType.fromJson(json.loads(state["schema"]))
            if state["schema"]
            else None
        )
        if not adds:
            if schema is None:
                raise ValueError(f"no schema recorded at version {version!r}")
            return self.spark.createDataFrame([], schema)
        if schema is not None:
            # the recorded schema AT this version pins the read: after
            # schema evolution, files written pre-widening simply surface
            # NULL for the newer columns (parquet reader fills missing
            # columns), and time travel to an old version reads the OLD
            # schema — per-version fidelity without mergeSchema footers
            return self.spark.read.schema(schema).parquet(
                *[a["path"] for a in adds]
            )
        return self.spark.read.parquet(*[a["path"] for a in adds])

    def file_count(self, version: "int | None" = None) -> int:
        return len(self._snapshot_adds(version))

    def prune_files(
        self, conjuncts: "list[tuple]", version: "int | None" = None
    ) -> "list[dict]":
        """Log-stats data skipping (Delta's file-pruning rule): return
        the live add actions whose recorded per-column min/max stats
        CANNOT rule out a match for ``conjuncts`` — a list of
        ``(column, op, value)`` triples AND-ed together, ops in
        ``= < <= > >= between`` (``between`` takes a ``(lo, hi)``
        value). Driver-side over log metadata only, zero Spark jobs.

        Soundness rules: a file lacking stats for a column (legacy
        commit, > STATS_COLUMNS, long-string extremes, unsupported
        type) is KEPT; an all-NULL column (min/max None with nulls ==
        rows) is pruned for any comparison conjunct, since NULL
        satisfies none of these ops; string comparison is Python's
        code-point order, which equals Spark's binary UTF-8 order.

        Why this exists at 100 TB: Spark's parquet reader skips row
        groups via footers, but only AFTER scheduling a task per file
        and reading its footer — at 100k+ files the listing/scheduling
        overhead dominates selective queries. Pruning from the commit
        log's stats (one driver-side pass over metadata the log already
        carries) shrinks the scan's file list itself, which is the
        entire point of OPTIMIZE ZORDER BY: after clustering, every
        listed dimension's per-file ranges are tight, so this prune
        drops most files for predicates on ANY of them."""
        _validate_conjuncts(conjuncts)
        return [
            a
            for a in self._snapshot_adds(version)
            if _stats_may_match(a, conjuncts)
        ]

    def read_pruned(
        self, conjuncts: "list[tuple]", version: "int | None" = None
    ) -> DataFrame:
        """Snapshot read with log-stats file pruning: scan only the
        files :meth:`prune_files` keeps, then apply ``conjuncts`` as a
        real row filter (the stats prune is file-granular; surviving
        files still hold non-matching rows). Result rows are EXACTLY
        ``read(version).filter(<conjuncts>)`` — the prune is a pure
        optimization, asserted by tests."""
        adds = self.prune_files(conjuncts, version)
        schema = self._latest_schema(version)

        def _filter(df: DataFrame) -> DataFrame:
            for col, op, val in conjuncts:
                c = F.col(col)
                if op == "between":
                    df = df.filter(c.between(val[0], val[1]))
                else:
                    df = df.filter(
                        {"=": c == val, "<": c < val, "<=": c <= val,
                         ">": c > val, ">=": c >= val}[op]
                    )
            return df

        if not adds:
            if schema is None:
                raise ValueError("table has no commits")
            return _filter(self.spark.createDataFrame([], schema))
        reader = (
            self.spark.read.schema(schema)
            if schema is not None
            else self.spark.read
        )
        return _filter(reader.parquet(*[a["path"] for a in adds]))

    def read_changes(self, since_version: int = -1) -> DataFrame:
        """The commit log as an incremental feed — the table-side half of
        the reference's stream/table duality (a ksqlDB TABLE is a
        changelog you can re-consume; here the transaction log IS that
        changelog). Returns every row ADDED by commits after
        ``since_version``, tagged with ``_commit_version`` and
        ``_commit_op``, so a downstream consumer can advance a cursor
        with exactly-once batch semantics (process commits ``(v, v']``,
        persist ``v'``, repeat).

        Semantics per op: for ``append`` commits these are exactly the
        inserted rows; for ``merge`` commits with row-level change files
        (``change_feed=True`` at merge time) they are exactly the
        changed rows (insert + update post-images — unchanged rows of
        rewritten files never appear); for legacy add-file-level merges
        and ``optimize`` they are the POST-IMAGE of the rewritten key
        range (the whole-file trade this feed's cdc path removes).
        ``create`` commits contribute nothing. Maintenance ops that only
        reorganize bytes (``optimize``) can be skipped by the consumer
        via ``_commit_op``. Raises below the vacuum watermark: reclaimed
        versions cannot be replayed.

        Plan size is O(schema epochs), not O(commits in span): contiguous
        same-schema commits are read by ONE multi-path scan and each
        row's ``_commit_version``/``_commit_op`` is recovered from a
        broadcast path->version map joined on ``input_file_name()`` —
        a full-history replay over thousands of commits stays a
        handful of scan nodes."""
        latest = self.latest_version()
        if since_version >= latest:
            schema = self._latest_schema()
            if schema is None:
                raise ValueError("table has no commits")
            empty = self.spark.createDataFrame([], schema)
            return empty.withColumn(
                "_commit_version", F.lit(None).cast("long")
            ).withColumn("_commit_op", F.lit(None).cast("string"))
        wm = self._vacuum_watermark()
        if since_version + 1 < wm:
            raise ValueError(
                f"changes since {since_version} include vacuumed versions "
                f"(earliest retained: {wm})"
            )
        # post-image feed: removed files never replay
        groups = self._feed_groups(
            since_version, skip_optimize=False, kinds=("cdc", "add")
        )
        if not groups:
            return self.read_changes(latest)  # typed empty frame

        def _post_images(kind, scan):
            if kind == "cdc":
                return scan.filter(
                    F.col("_change_type").isin("insert", "update_postimage")
                ).drop("_change_type")
            return scan

        return self._assemble_feed(groups, with_op=True, transform=_post_images)

    def _feed_groups(
        self,
        since_version: int,
        skip_optimize: bool,
        require_row_level: bool = False,
        kinds: "tuple[str, ...]" = ("cdc", "add", "remove"),
    ) -> "dict[tuple, list]":
        """ONE commit-tail walk shared by every feed: the skip rules,
        the incremental schema-epoch tracking, and the
        cdc-vs-add-vs-remove grouping. Returns
        ``{(kind, schema_json): [(path, version, op), ...]}`` with kind
        in {'cdc', 'add', 'remove'} — callers pick the kinds their
        semantics need. ``require_row_level`` raises on a merge commit
        without change files (read_row_changes' fidelity contract).
        Each commit file is read exactly once; the schema is tracked
        incrementally (a per-commit _latest_schema would re-fold the
        log O(tail) times)."""
        schema_json = (
            self._fold_log(since_version)["schema"] if since_version >= 0 else None
        )
        groups: "dict[tuple, list]" = {}
        for v in self._list_versions():
            if v <= since_version:
                continue
            c = self._read_commit(v)
            if c.get("schema") is not None:
                schema_json = c["schema"]
            if skip_optimize and c["op"] == "optimize":
                continue
            cdc = [a["cdc"]["path"] for a in c["actions"] if "cdc" in a]
            adds = [a["add"]["path"] for a in c["actions"] if "add" in a]
            removed = [
                a["remove"]["path"] for a in c["actions"] if "remove" in a
            ]
            if cdc:
                # a commit carrying row-level change files replays THEM,
                # never its whole-file post-image adds/removes
                groups.setdefault(("cdc", schema_json), []).extend(
                    (p, v, c["op"]) for p in cdc
                )
                continue
            if (
                require_row_level
                and c["op"] in ("merge", "delete", "update", "restore")
                and (adds or removed)
            ):
                raise ValueError(
                    f"commit {v} is a {c['op']} without row-level change "
                    "files (change_feed was off); its row-level effects "
                    "cannot be reconstructed — replay it via "
                    "read_changes/read_deltas instead"
                )
            if adds and "add" in kinds:
                groups.setdefault(("add", schema_json), []).extend(
                    (p, v, c["op"]) for p in adds
                )
            if removed and "remove" in kinds:
                groups.setdefault(("remove", schema_json), []).extend(
                    (p, v, c["op"]) for p in removed
                )
        return groups

    def _assemble_feed(
        self,
        groups: "dict[tuple, list]",
        with_op: bool,
        transform,
    ) -> DataFrame:
        """Shared parts assembly for the three feeds: one grouped scan
        per (kind, schema epoch), a per-kind row transform, and the
        allowMissingColumns union that widens across schema-evolution
        boundaries (pre-evolution commits read NULL for newer columns,
        the same rule merge itself applies)."""
        parts = [
            transform(kind, self._grouped_scan(kind, sj, entries, with_op))
            for (kind, sj), entries in groups.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def _grouped_scan(
        self,
        kind: str,
        schema_json: "str | None",
        entries: "list[tuple]",
        with_op: bool,
    ) -> DataFrame:
        """ONE multi-path scan over every file of a (action kind, schema
        epoch) group, with each row's commit version (and op) recovered
        by joining canonicalized ``input_file_name()`` against a
        broadcast path->version map — the construction that keeps feed
        plans O(schema epochs) instead of O(commits). ``kind='cdc'``
        widens the recorded schema with the ``_change_type`` tag the
        change files carry."""
        sch = (
            StructType.fromJson(json.loads(schema_json))
            if schema_json is not None
            else None
        )
        if kind == "cdc" and sch is not None:
            sch = StructType(
                list(sch.fields) + [StructField("_change_type", StringType())]
            )
        reader = self.spark.read.schema(sch) if sch is not None else self.spark.read
        map_schema = "__path string, _commit_version long" + (
            ", _commit_op string" if with_op else ""
        )
        pmap = self.spark.createDataFrame(
            [
                (p, int(v), str(op))[: 3 if with_op else 2]
                for (p, v, op) in entries
            ],
            map_schema,
        )
        scan = reader.parquet(*[p for (p, _, _) in entries]).withColumn(
            # input_file_name() in stored-path spelling (_canon_path_col:
            # percent-decoded with '+' preserved, scheme stripped) — a
            # URI-encoded spelling mismatch would otherwise silently drop
            # every row of the affected files from the feed
            "__path",
            self._canon_path_col(),
        )
        # LEFT join + fail-fast, never inner: an inner join would make any
        # residual spelling mismatch SILENTLY DROP those files' rows from
        # the feed — replica corruption with no error. A NULL
        # _commit_version now raises with the offending path instead.
        joined = scan.join(F.broadcast(pmap), "__path", "left")
        guarded = F.when(
            F.col("_commit_version").isNotNull(), F.col("_commit_version")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "feed scan file missing from the commit path map "
                        "(path spelling mismatch would corrupt the feed): "
                    ),
                    F.col("__path"),
                )
            )
        )
        return joined.withColumn("_commit_version", guarded).drop("__path")

    def read_row_changes(self, since_version: int = -1) -> DataFrame:
        """The TYPED row-level change feed (Delta CDF's consumer shape):
        every row carries ``_change_type`` ∈ {insert, update_preimage,
        update_postimage, delete} plus ``_commit_version`` — appends
        surface their rows as ``insert``, merges surface the pre/post
        images their change files recorded, ``optimize``/``create``
        contribute nothing. The feed replicates the table: merge the
        {insert, update_postimage, delete} subset into a target keyed
        the same way with ``order_col="_commit_version"`` and
        ``delete_col=(_change_type = 'delete')`` and the target
        converges to the source's LATEST-ROW-PER-KEY state — identical
        to the full table whenever keys are unique, which is the
        invariant merge-maintained tables keep. A source that stacks
        duplicate keys via blind appends replicates as its newest row
        per key (same-commit duplicates: arbitrary winner, the standard
        CDC-apply caveat) — the merge-shaped replica cannot represent
        duplicate keys. The ACID-to-ACID replication primitive, proven
        in tests/test_acid.py.

        STRICT about fidelity: raises if the span contains a merge
        commit without change files (``change_feed`` was off) — such a
        commit's row-level deletes are unrecoverable, and silently
        degrading to whole-file post-images would corrupt a replica.
        Same O(schema epochs) plan bound as ``read_changes``."""
        latest = self.latest_version()
        if since_version >= latest:
            base = self.read_changes(latest).drop("_commit_op")
            return base.withColumn("_change_type", F.lit(None).cast("string"))
        wm = self._vacuum_watermark()
        if since_version + 1 < wm:
            raise ValueError(
                f"row changes since {since_version} include vacuumed "
                f"versions (earliest retained: {wm})"
            )
        groups = self._feed_groups(
            since_version,
            skip_optimize=True,
            require_row_level=True,
            kinds=("cdc", "add"),
        )
        if not groups:
            return self.read_row_changes(latest)  # typed empty frame

        def _typed(kind, scan):
            if kind != "cdc":
                return scan.withColumn("_change_type", F.lit("insert"))
            return scan

        out = self._assemble_feed(groups, with_op=False, transform=_typed)
        # stable column order regardless of which kind led the union:
        # data columns first, then the two feed metadata columns
        meta = ["_commit_version", "_change_type"]
        return out.select(
            *[c for c in out.columns if c not in meta], *meta
        )

    def stream_changes(
        self, since_version: int = -1, commits_per_batch: int = 1
    ) -> DataFrame:
        """The change feed as a Structured Streaming source: one
        micro-batch per source commit by default (available-now replay,
        commit order preserved). This closes the reference's
        stream/table dual read (T11 — the same name readable as current
        state AND as a changelog stream) for the ACID table: ``read()``
        is the table side, this is the stream side, and both are views
        of the same transaction log. Downstream stateful operators
        (windowed aggs, the sketch automata, ``foreachBatch`` sinks)
        consume it like any other stream; pair with
        ``read_deltas``-style cursors for exactly-once hand-off.

        ``commits_per_batch`` groups ADJACENT commit versions into one
        micro-batch — the catch-up path for a consumer resuming far
        behind the head: per-micro-batch fixed costs (state-store
        checkpoint, planning) amortize over the span instead of
        replaying one commit at a time. Safe for any order-invariant
        fold and for consumers that rank on ``_commit_version`` inside
        the batch; keep the default when per-commit emission granularity
        is itself the contract. Grouping is DETERMINISTIC: the slice
        index is derived per row as
        ``(_commit_version - min_version) // commits_per_batch`` (r14
        ADVICE — ``repartitionByRange``'s sampled boundaries only
        promise non-splitting, not the exact ceil(n/k) grouping the
        contract states; skewed commit sizes could realize 1+3 instead
        of 2+2), so a commit never splits across batches, order is
        preserved, and the batching is the same on every run."""
        from data_pipeline_kafka_ek_spark.streaming import runtime as _rt

        feed = self.read_changes(since_version)
        versions = [v for v in self._list_versions() if v > since_version]
        return _rt.commit_span_stream(
            self.spark, feed, versions, commits_per_batch
        )

    def read_deltas(self, since_version: int = -1) -> DataFrame:
        """Signed row deltas for commits after ``since_version``: rows of
        ADDED files carry ``_weight`` +1, rows of REMOVED files -1, so
        ``sum(_weight * x)`` over the feed is EXACTLY the change any
        distributive aggregate (count, sum, and through them mean)
        experienced — the retraction-carrying feed incremental
        materialized-view maintenance needs (``read_changes`` alone is
        post-image only and cannot retract a rewritten row's old value).
        ``optimize`` commits are skipped outright: they add and remove
        identical row sets, so their net delta is zero by construction
        and replaying them would only cost I/O.

        A merge that wrote row-level change files (``change_feed=True``)
        replays THEM: +1 for insert/update_postimage rows, -1 for
        update_preimage/delete rows — exactly the row-level delta, so a
        merge touching 1% of a file's rows moves ~1% of the rows through
        a downstream fold instead of retracting and re-adding the whole
        rewritten file. Legacy merges without change files keep the
        add/remove whole-file form. Same O(schema epochs) plan bound as
        ``read_changes``.

        Stricter vacuum bound than ``read_changes``: a commit's REMOVED
        files were live only BEFORE it, so replaying deltas needs
        ``since_version >= watermark`` (the removed files of commit
        ``wm`` itself may already be reclaimed)."""
        latest = self.latest_version()
        if since_version >= latest:
            empty = self.read_changes(latest).drop("_commit_op")
            return empty.withColumn("_weight", F.lit(None).cast("int"))
        wm = self._vacuum_watermark()
        # commit c's REMOVED files were live only at c-1; after a vacuum
        # to watermark wm, the first commit whose pre-image is guaranteed
        # on disk is wm+1 — so the earliest safe cursor is wm (wm == 0
        # means never vacuumed: every image exists and cursor -1 is fine)
        if wm > 0 and since_version < wm:
            raise ValueError(
                f"deltas since {since_version} need pre-{wm} file images "
                f"that vacuum may have reclaimed (earliest safe cursor: {wm})"
            )
        groups = self._feed_groups(since_version, skip_optimize=True)
        if not groups:
            return self.read_deltas(latest)  # typed empty frame

        def _signed(kind, scan):
            if kind == "cdc":
                return scan.withColumn(
                    "_weight",
                    F.when(
                        F.col("_change_type").isin(
                            "insert", "update_postimage"
                        ),
                        F.lit(1),
                    )
                    .otherwise(F.lit(-1))
                    .cast("int"),
                ).drop("_change_type")
            return scan.withColumn(
                "_weight", F.lit(1 if kind == "add" else -1).cast("int")
            )

        return self._assemble_feed(groups, with_op=False, transform=_signed)

    # -- maintenance --------------------------------------------------------

    def unreferenced_files(self) -> "list[str]":
        """Data files no retained snapshot references (vacuum candidates).
        Conservative: a file referenced by ANY commit in the log is kept,
        so time travel over the whole retained log keeps working. Exact
        canonical-path set membership — no suffix matching."""
        referenced: set[str] = set()
        for v in self._list_versions():
            for action in self._read_commit(v)["actions"]:
                if "add" in action:
                    referenced.add(_canon(action["add"]["path"]))
        fs, jdir = self._fs(f"{self.path}/files")
        out = []
        if fs.exists(jdir):
            it = fs.listFiles(jdir, True)
            while it.hasNext():
                p = _canon_uri(it.next().getPath().toString())
                name = p.rsplit("/", 1)[-1]
                if name.startswith("part-") and p not in referenced:
                    out.append(p)
        return out

    def orphaned_tmp_files(self, older_than_s: float = 3600.0) -> "list[str]":
        """Unpublished temp bodies a crashed writer left in the log dir.
        Age-gated: an in-flight writer's temp (written, not yet linked)
        must not be swept from under it."""
        import time as _time

        fs, jdir = self._fs(self.log_dir)
        if not fs.exists(jdir):
            return []
        cutoff_ms = (_time.time() - older_than_s) * 1000.0
        out = []
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            # .tmp- = crashed commit publish; .wm- = crashed vacuum
            # watermark replace
            if name.startswith((".tmp-", ".wm-")) and (
                st.getModificationTime() <= cutoff_ms
            ):
                out.append(f"{self.log_dir}/{name}")
        return sorted(out)

    def vacuum(
        self,
        retain_versions: int = 10,
        retain_tmp_s: float = 3600.0,
        min_age_s: float = 3600.0,
        dry_run: bool = False,
    ) -> "dict[str, int]":
        """Delete data files referenced ONLY by snapshots older than the
        last ``retain_versions`` versions, plus aged orphan temp files.
        Advances the watermark so time travel below it raises cleanly.
        Returns counts. The protected set is the exact union of the
        retained snapshots' canonical add paths — a file shared between an
        old and a retained snapshot survives.

        ``min_age_s`` is the concurrent-writer guard (Delta's retention
        rule): a writer's data files land on disk BEFORE its commit
        publishes, so a freshly written file is unreferenced-but-live —
        deleting it would corrupt the commit that is about to reference
        it (or a commit that published after the protected set was
        computed). Only files older than ``min_age_s`` are eligible;
        size it above the longest plausible write-to-publish window.

        ``dry_run=True`` (Delta's VACUUM ... DRY RUN) computes the same
        eligible sets and returns the same counts but deletes NOTHING
        and leaves the watermark untouched — the safe preview to run
        before handing retention a real table."""
        import time as _time

        latest = self.latest_version()
        if latest < 0:
            return {
                "data_files_deleted": 0,
                "tmp_files_deleted": 0,
                "change_files_deleted": 0,
            }
        wm = max(0, latest - retain_versions + 1)
        protected: set[str] = set()
        for v in range(wm, latest + 1):
            for a in self._snapshot_adds(v):
                protected.add(_canon(a["path"]))
        age_cutoff_ms = (_time.time() - min_age_s) * 1000.0
        # watermark FIRST, deletion second: a vacuum that dies in between
        # leaves files missing only BELOW the advanced watermark, so reads
        # still fail with the clean below-watermark ValueError instead of
        # mid-scan FileNotFound (the ordering the watermark exists for).
        # Marker write is temp + atomic replace (single writer per vacuum
        # is the deployment contract; a torn marker degrades to 0, see
        # _vacuum_watermark)
        marker = f"{self.log_dir}/_vacuum_watermark"
        # monotonic clamp: a later vacuum with a LARGER retain_versions
        # computes a smaller wm; writing it verbatim would move the marker
        # backwards below versions whose files are already reclaimed, so
        # those reads would pass the watermark check and die mid-scan with
        # FileNotFound — the exact failure the marker exists to prevent.
        # Deletion still uses the newly computed protected set (keeping
        # MORE files than the marker promises is safe).
        wm_marker = max(self._vacuum_watermark(), wm)
        body = json.dumps({"min_version": wm_marker})
        mfs, mpath = self._fs(marker)
        if dry_run:
            pass  # preview only: no watermark advance, no deletion
        elif mfs.getUri().getScheme() == "file":
            import os as _os

            tmp = f"{self.log_dir}/.wm-{uuid.uuid4().hex}"
            local_tmp = _canon(tmp)
            with open(local_tmp, "w", encoding="utf-8") as fh:
                fh.write(body)
            _os.replace(local_tmp, _canon(marker))
        else:
            out = mfs.create(mpath, True)
            try:
                out.write(bytearray(body.encode("utf-8")))
            finally:
                out.close()
        fs, jdir = self._fs(f"{self.path}/files")
        deleted = 0
        if fs.exists(jdir):
            doomed = []
            it = fs.listFiles(jdir, True)
            while it.hasNext():
                st = it.next()
                p = _canon_uri(st.getPath().toString())
                if (
                    p.rsplit("/", 1)[-1].startswith("part-")
                    and p not in protected
                    and st.getModificationTime() <= age_cutoff_ms
                ):
                    doomed.append(p)
            for p in doomed:
                deleted += 1
                if dry_run:
                    continue
                _, jp = self._fs(p)
                fs.delete(jp, False)
        # change-file sweep: row-level cdc files are replayable only for
        # commits at/above the watermark (read_changes raises below it),
        # so cdc files referenced only by sub-watermark commits — plus
        # attempt directories orphaned by lost merge races, which no
        # commit references at all — are reclaimed once past the same
        # in-flight age guard as data files
        cdc_protected: set[str] = set()
        for v in self._list_versions():
            if v >= wm_marker:
                for a in self._read_commit(v)["actions"]:
                    if "cdc" in a:
                        cdc_protected.add(_canon(a["cdc"]["path"]))
        change_deleted = 0
        cfs, cdir = self._fs(f"{self.path}/changes")
        if cfs.exists(cdir):
            doomed_cdc = []
            it = cfs.listFiles(cdir, True)
            while it.hasNext():
                st = it.next()
                p = _canon_uri(st.getPath().toString())
                if (
                    p.rsplit("/", 1)[-1].startswith("part-")
                    and p not in cdc_protected
                    and st.getModificationTime() <= age_cutoff_ms
                ):
                    doomed_cdc.append(p)
            for p in doomed_cdc:
                change_deleted += 1
                if dry_run:
                    continue
                _, jp = self._fs(p)
                cfs.delete(jp, False)
        tmp_deleted = 0
        for p in self.orphaned_tmp_files(older_than_s=retain_tmp_s):
            tmp_deleted += 1
            if dry_run:
                continue
            tfs, jp = self._fs(p)
            tfs.delete(jp, False)
        return {
            "data_files_deleted": deleted,
            "tmp_files_deleted": tmp_deleted,
            "change_files_deleted": change_deleted,
        }

    def foreach_batch_writer(self, app_id: str, delete_col: "str | None" = None):
        """``foreachBatch`` target: exactly-once idempotent MERGE of each
        micro-batch (replayed batch ids are skipped via the txn action)."""

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            self.merge(
                batch_df,
                delete_col=delete_col,
                txn={"app_id": app_id, "batch_id": int(batch_id)},
            )

        return apply
