"""ACID transaction-log table: the production form of the changelog
materialization (reference: the compacted-topic TABLE abstraction,
ksqldb-statements.sql:42-43), built Delta-protocol-style on plain parquet
plus an ordered JSON commit log — no external table-format dependency,
same interface shape as ``sources/cdc.py::MaterializedTable`` but with the
four properties that class's bucketed-rewrite twin documents as missing:

* **Atomic commits** — a commit version is claimed with an O_EXCL
  ``createNewFile`` marker, then its JSON body renamed into
  ``_txn_log/<version>.json``; readers either see the whole commit or
  none of it (POSIX rename silently replaces, so the claim — not the
  rename — is the arbiter; see ``_write_text_atomic``). Data files are
  immutable once referenced.
* **Optimistic concurrency** — writers racing to the same version:
  exactly one claim wins; the loser re-reads the log and either retries
  on top (blind append, thread-pool-race tested) or raises
  ``ConcurrentModification`` (merge whose rewritten files were removed
  under it) — the Delta/Iceberg conflict rule.
* **Snapshot isolation + time travel** — ``read(version=k)`` reconstructs
  the live file set at any retained version; concurrent commits never
  tear an in-flight read (its file list is pinned when the snapshot is
  taken).
* **Idempotent streaming writes** — each commit can carry a
  ``(app_id, batch_id)`` transaction action; a replayed foreachBatch
  micro-batch with an already-recorded batch id is skipped, giving
  exactly-once sinks over at-least-once replays.

Scale design (the part that must survive 100 TB):

* The log is O(commits) tiny JSON files; every ``checkpoint_interval``
  commits a ``<v>.checkpoint.json`` file materializes the full live add
  set and ``_last_checkpoint`` points at it, so snapshot construction
  reads one checkpoint + the tail — never the whole history.
* Each commit's data files are key-RANGE clustered
  (``repartitionByRange`` on the merge key) and every add action records
  the file's ``[min_key, max_key]``. MERGE prunes with those stats: only
  files whose range overlaps the incoming change keys are rewritten —
  merge cost is proportional to the touched key range, not table size
  (same motivation as MaterializedTable's bucket rewrite, but with
  file-level stats instead of a fixed bucket grid).
* All metadata passes run driver-side over the log only (file counts,
  never row counts); all data passes are DataFrame plans.

Reference scope: the reference gets these guarantees from Kafka compacted
topics + ksqlDB internal state; this module is the lake-side twin.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


class ConcurrentModification(Exception):
    """A competing commit removed or rewrote files this merge depends on."""


class TxnLogTable:
    """Delta-style ACID table over parquet + an ordered JSON commit log."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        order_col: str,
        files_per_commit: int = 4,
        checkpoint_interval: int = 10,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = key
        self.order_col = order_col
        self.files_per_commit = files_per_commit
        self.checkpoint_interval = checkpoint_interval
        self.log_dir = f"{self.path}/_txn_log"

    # -- Hadoop FS plumbing (works on file:/, HDFS, object stores) ---------

    def _fs(self, p: str):
        jpath = self.spark._jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _write_text_atomic(self, dest: str, body: str) -> bool:
        """Create ``dest`` atomically; returns False if another writer owns
        the version (the optimistic-concurrency signal).

        The claim is an atomic create-if-absent of ``dest + '.claim'``
        (see :meth:`_claim` for the per-filesystem primitive) because a
        plain rename race is NOT safe on the local filesystem: POSIX
        rename(2) silently REPLACES an existing destination, so two
        racers could both believe they won (observed as a duplicated
        version under a thread-pool append race). The winner then writes a
        temp file and renames it into place, so readers listing ``*.json``
        never observe a partial commit. A claim whose owner crashed
        before the rename parks that version number permanently — retry
        loops therefore bump PAST their failed attempt
        (``max(latest+1, attempted+1)``) instead of re-deriving it from
        the committed log, and snapshot replay iterates the versions
        that actually exist, so a parked number is just a harmless gap;
        a real deployment would also age out orphaned claims (Delta's
        per-filesystem LogStore makes the same trade explicit)."""
        fs, dpath = self._fs(dest)
        if fs.exists(dpath):
            return False
        if not self._claim(fs, dest + ".claim"):
            return False
        tmp = f"{self.log_dir}/.tmp-{uuid.uuid4().hex}"
        _, tpath = self._fs(tmp)
        out = fs.create(tpath, False)
        try:
            out.write(bytearray(body.encode("utf-8")))
        finally:
            out.close()
        ok = fs.rename(tpath, dpath)
        if not ok:
            fs.delete(tpath, False)
        return bool(ok)

    def _claim(self, fs, claim_path: str) -> bool:
        """Atomically create the claim marker; False = another writer owns
        the version. Per-filesystem primitive, LogStore-style: Hadoop's
        LOCAL createNewFile is exists-then-create (a TOCTOU window — two
        thread-pool racers both got the claim under load, and the loser
        path surfaces as FileAlreadyExistsException), so for file: we use
        POSIX ``O_CREAT|O_EXCL`` directly; remote filesystems (HDFS) get
        ``createNewFile``, which is atomic server-side there."""
        scheme = fs.getUri().getScheme()
        if scheme == "file":
            import errno
            import os as _os

            local = claim_path[5:] if claim_path.startswith("file:") else claim_path
            _os.makedirs(_os.path.dirname(local), exist_ok=True)
            try:
                fd = _os.open(local, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            except OSError as exc:
                if exc.errno == errno.EEXIST:
                    return False
                raise
            _os.close(fd)
            return True
        _, cpath = self._fs(claim_path)
        try:
            return bool(fs.createNewFile(cpath))
        except Exception as exc:  # races surface as FileAlreadyExists
            if "AlreadyExists" in str(exc) or "already exists" in str(exc):
                return False
            raise

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

    def _list_versions(self) -> "list[int]":
        fs, jpath = self._fs(self.log_dir)
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.endswith(".json") and not name.endswith(".checkpoint.json") \
                    and not name.startswith((".", "_")):
                out.append(int(name[: -len(".json")]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self._list_versions()
        return vs[-1] if vs else -1

    def _commit_path(self, version: int) -> str:
        return f"{self.log_dir}/{version:020d}.json"

    def _read_commit(self, version: int) -> dict:
        return json.loads(self._read_text(self._commit_path(version)))

    def _last_checkpoint(self) -> "tuple[int, list[dict]] | None":
        marker = f"{self.log_dir}/_last_checkpoint"
        fs, jpath = self._fs(marker)
        if not fs.exists(jpath):
            return None
        v = int(json.loads(self._read_text(marker))["version"])
        body = json.loads(
            self._read_text(f"{self.log_dir}/{v:020d}.checkpoint.json")
        )
        return v, body["adds"]

    def _snapshot_adds(self, version: "int | None" = None) -> "list[dict]":
        """Live add actions at ``version`` (default: latest): replay the
        log from the newest checkpoint at or before it."""
        versions = self._list_versions()
        if version is None:
            if not versions:
                return []
            version = versions[-1]
        live: dict[str, dict] = {}
        start = 0
        ckpt = self._last_checkpoint()
        if ckpt is not None and ckpt[0] <= version:
            start = ckpt[0] + 1
            live = {a["path"]: a for a in ckpt[1]}
        for v in versions:
            if v < start or v > version:
                continue
            commit = self._read_commit(v)
            for action in commit["actions"]:
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
        return list(live.values())

    def history(self) -> "list[dict]":
        """Commit metadata, oldest first — op, version, txn, file deltas."""
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
                }
            )
        return out

    def txn_seen(self, app_id: str, batch_id: int) -> bool:
        """Has ``(app_id, batch_id)`` (or a later batch of the same app)
        already committed? The exactly-once guard for replayed batches."""
        best = -1
        for v in self._list_versions():
            txn = self._read_commit(v).get("txn")
            if txn and txn["app_id"] == app_id:
                best = max(best, int(txn["batch_id"]))
        return batch_id <= best

    # -- data-file writing ----------------------------------------------------

    def _write_data_files(self, df: DataFrame) -> "list[dict]":
        """Write ``df`` key-range clustered into a fresh immutable commit
        directory; return add actions carrying per-file [min,max] key
        stats (what MERGE prunes on)."""
        commit_dir = f"{self.path}/files/c-{uuid.uuid4().hex}"
        clustered = df.repartitionByRange(self.files_per_commit, F.col(self.key))
        clustered.write.mode("overwrite").parquet(commit_dir)
        fs, jdir = self._fs(commit_dir)
        adds = []
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if not name.startswith("part-"):
                continue
            fpath = f"{commit_dir}/{name}"
            stats = (
                self.spark.read.parquet(fpath)
                .agg(
                    F.min(self.key).alias("lo"),
                    F.max(self.key).alias("hi"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            if stats["n"] == 0:
                continue
            adds.append(
                {
                    "path": fpath,
                    "min_key": stats["lo"],
                    "max_key": stats["hi"],
                    "rows": stats["n"],
                }
            )
        return adds

    def _try_commit(
        self,
        version: int,
        op: str,
        actions: "list[dict]",
        txn: "dict | None",
    ) -> bool:
        body = json.dumps(
            {"version": version, "op": op, "actions": actions, "txn": txn}
        )
        ok = self._write_text_atomic(self._commit_path(version), body)
        if ok and version % self.checkpoint_interval == 0 and version > 0:
            adds = self._snapshot_adds(version)
            self._write_text_atomic(
                f"{self.log_dir}/{version:020d}.checkpoint.json",
                json.dumps({"version": version, "adds": adds}),
            )
            # _last_checkpoint is a pointer, overwritten in place (its loss
            # or staleness only costs log-replay time, never correctness)
            fs, marker = self._fs(f"{self.log_dir}/_last_checkpoint")
            out = fs.create(marker, True)
            try:
                out.write(bytearray(json.dumps({"version": version}).encode()))
            finally:
                out.close()
        return ok

    # -- public write ops -----------------------------------------------------

    def append(
        self,
        df: DataFrame,
        txn: "dict | None" = None,
        max_retries: int = 20,
    ) -> int:
        """Blind append: new files only, conflicts never destroy work —
        on a version race the writer re-reads the log and retries the
        commit (the data files are already safely in place)."""
        if txn is not None and self.txn_seen(txn["app_id"], txn["batch_id"]):
            return self.latest_version()
        adds = self._write_data_files(df)
        actions = [{"add": a} for a in adds]
        v = self.latest_version() + 1
        for _ in range(max_retries):
            if self._try_commit(v, "append", actions, txn):
                return v
            # bump past the failed attempt too: a claim whose owner died
            # before renaming never produces a .json, so deriving the next
            # version from the committed log alone would spin forever
            v = max(self.latest_version() + 1, v + 1)
        raise ConcurrentModification(
            f"append lost the commit race {max_retries} times"
        )

    def merge(
        self,
        changes: DataFrame,
        delete_col: "str | None" = None,
        txn: "dict | None" = None,
        max_retries: int = 5,
    ) -> int:
        """Upsert (and optionally delete) by key — the MERGE statement's
        semantics: latest row per key wins by ``order_col`` (changes beat
        existing rows on ties; two CHANGE rows tying on both key and
        ``order_col`` are an input-contract violation — the winner among
        them is arbitrary, same caveat as any CDC apply, so feed batches
        with a strictly ordered ``order_col`` per key). Only files whose
        [min,max] key range overlaps the incoming keys are rewritten
        (stats pruning); a
        competing commit that removes one of those files between snapshot
        and commit raises ``ConcurrentModification`` (retry re-runs the
        merge on the new snapshot)."""
        if txn is not None and self.txn_seen(txn["app_id"], txn["batch_id"]):
            return self.latest_version()
        changes = changes.localCheckpoint(eager=True)
        bounds = changes.agg(
            F.min(self.key).alias("lo"), F.max(self.key).alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return self.latest_version()  # empty change set: no-op

        last_err = None
        attempted = -1
        for _ in range(max_retries):
            base_version = self.latest_version()
            live = self._snapshot_adds(base_version if base_version >= 0 else None)
            touched = [
                a
                for a in live
                if not (a["max_key"] < bounds["lo"] or a["min_key"] > bounds["hi"])
            ]
            if touched:
                old = self.spark.read.parquet(*[a["path"] for a in touched])
                # keep rows of untouched keys verbatim; merge the rest
                keys = changes.select(F.col(self.key)).distinct()
                untouched_rows = old.join(keys, self.key, "left_anti")
                contested = old.join(keys, self.key, "left_semi")
            else:
                untouched_rows = None
                contested = None
            ranked = changes.withColumn("__src", F.lit(1))
            if contested is not None:
                base_side = contested
                if delete_col is not None and delete_col not in base_side.columns:
                    # stored rows carry no tombstone column: align schemas
                    base_side = base_side.withColumn(delete_col, F.lit(False))
                ranked = base_side.withColumn("__src", F.lit(0)).unionByName(
                    ranked
                )
            w = Window.partitionBy(self.key).orderBy(
                F.desc(self.order_col), F.desc("__src")
            )
            merged = (
                ranked.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__src")
            )
            if delete_col is not None:
                merged = merged.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
                merged = merged.drop(delete_col)
                if untouched_rows is not None and delete_col in untouched_rows.columns:
                    untouched_rows = untouched_rows.drop(delete_col)
            if untouched_rows is not None:
                merged = merged.unionByName(untouched_rows)
            adds = self._write_data_files(merged)
            actions = [{"add": a} for a in adds] + [
                {"remove": {"path": a["path"]}} for a in touched
            ]
            # bump past a previously failed attempt (an orphaned claim
            # never yields a .json; see _write_text_atomic)
            v = max(base_version + 1, attempted + 1)
            attempted = v
            if self._try_commit(v, "merge", actions, txn):
                return v
            # lost the race: legal only if the winner didn't touch our files
            now_live = {a["path"] for a in self._snapshot_adds()}
            if any(a["path"] not in now_live for a in touched):
                last_err = ConcurrentModification(
                    "a competing commit rewrote files this merge read"
                )
                raise last_err
            # winner was a blind append elsewhere — re-run on new snapshot
        raise ConcurrentModification(
            f"merge lost the commit race {max_retries} times"
        )

    # -- read ops ---------------------------------------------------------------

    def read(self, version: "int | None" = None) -> DataFrame:
        """Snapshot read (time travel with ``version=k``). The file list is
        pinned here — later commits can't tear this DataFrame."""
        adds = self._snapshot_adds(version)
        if not adds:
            raise ValueError(f"no snapshot at version {version!r} (empty table)")
        return self.spark.read.parquet(*[a["path"] for a in adds])

    def file_count(self, version: "int | None" = None) -> int:
        return len(self._snapshot_adds(version))

    def unreferenced_files(self) -> "list[str]":
        """Data files no LIVE snapshot references (vacuum candidates).
        Conservative: a file referenced by ANY retained historical version
        is kept, so time travel over the whole log keeps working."""
        referenced: set[str] = set()
        for v in self._list_versions():
            for action in self._read_commit(v)["actions"]:
                if "add" in action:
                    referenced.add(action["add"]["path"])
        fs, jdir = self._fs(f"{self.path}/files")
        out = []
        if fs.exists(jdir):
            it = fs.listFiles(jdir, True)
            while it.hasNext():
                p = it.next().getPath().toString()
                name = p.rsplit("/", 1)[-1]
                if name.startswith("part-") and not any(
                    p.endswith(r.split("/files/", 1)[-1]) for r in referenced
                ):
                    out.append(p)
        return out

    def orphaned_claims(self) -> "list[str]":
        """Claim markers whose version never published a commit — the
        debris a crashed writer leaves (see ``_write_text_atomic``).
        Each parks only its own version number (writers skip past), so
        cleanup is hygiene, not correctness; a deployment would age
        these out alongside ``unreferenced_files``."""
        fs, jdir = self._fs(self.log_dir)
        if not fs.exists(jdir):
            return []
        names = {st.getPath().getName() for st in fs.listStatus(jdir)}
        return sorted(
            f"{self.log_dir}/{n}"
            for n in names
            if n.endswith(".json.claim") and n[: -len(".claim")] not in names
        )

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
