"""VintageTable — a Spark-native versioned parquet table.

Re-implements, on plain parquet + a JSON commit log, the Delta Lake surface
the reference choreography uses (citations are /root/reference/README.md):

    overwrite write            README.md:92,195   (WRITE, mode Overwrite)
    merge / upsert on key      README.md:125-130  (whenMatched updateAll /
                                                   whenNotMatched insertAll)
    predicate delete           README.md:281
    predicate update           README.md:290
    time travel by version     README.md:169,202  (versionAsOf)
    time travel by timestamp   README.md:166,321  (timestampAsOf)
    history()                  README.md:305-319
    schema-evolving merge      README.md:330,372-376
    compaction (dataChange=F)  README.md:403-412
    vacuum                     README.md:415

Design (scale notes):

- **Commit log**: ``_vintage_log/{version:08d}.json`` entries list ``add``/
  ``remove`` file actions (paths relative to the table root) plus operation
  metadata. A snapshot at version v is the file set after replaying entries
  0..v — identical in spirit to Delta's log replay. Entries are finalized
  with an atomic CAS publish (``os.link`` EEXIST; object stores swap in a
  conditional PUT) so exactly one writer wins each version number, and
  mutations retry against the new snapshot on conflict (``_retry_conflicts``)
  — optimistic concurrency like Delta's. The reference itself is a single
  Spark shell, so this is strictly stronger than its requirements.

- **Copy-on-write mutations**: merge/delete/update first find the files that
  actually contain affected rows (a left-semi join / filter over the
  snapshot reading ONLY the key/predicate columns, via the
  ``_metadata.file_path`` column — parquet column pruning makes this cheap),
  then rewrite just those files. Untouched files survive across versions, so
  a merge touching 1% of a 100 TB table rewrites ~1 TB, not 100 TB.

- **All data movement is executor-side** DataFrame work; the driver only
  handles file *names* (metadata), never rows.
"""

from __future__ import annotations

import functools
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_vintage_log"
_DATA_DIR = "data"
_CHANGE_DIR = "_change_data"
# Deletion-vector sidecars (merge-on-read deletes): parquet files of
# (file, pos) pairs naming deleted row positions of live data files.
# Tracked in commits' add/remove like data files; the "dv/" prefix is what
# distinguishes them in a live-file list.
_DV_DIR = "dv"
# Delta checkpoints every 10 commits by default; same cadence here.
_CHECKPOINT_EVERY = 10
# Bounded optimistic-concurrency retries, like Delta's
# spark.databricks.delta.maxCommitAttempts (just much smaller: each retry
# re-runs the full operation, so runaway retrying hides real contention).
_COMMIT_RETRIES = 3

# Live-data-bytes gate below which a non-validating merge skips its
# zone-map pruning aggregate (one Spark job per commit): on a table this
# small the touched-file scan reads every live file in one task wave
# anyway, so computing the source key range to prune files cannot pay for
# the job's fixed cost. Driver-side file stats, no Spark job; identical
# merge results either way (pruning is an over-approximation).
_MERGE_PRUNE_MIN_BYTES = int(
    os.environ.get("SDLT_MERGE_PRUNE_MIN_BYTES", str(64 << 20))
)


def _retry_conflicts(fn):
    """Optimistic concurrency for mutations: on ``CommitConflictError`` the
    whole operation re-runs against the NEW snapshot (every mutation derives
    its state from the log on entry, so re-invocation IS the re-derivation —
    touched files, zone-map pruning and all), up to ``_COMMIT_RETRIES``
    times. The loser of a race therefore lands the same state as sequential
    application.

    Also owns failure hygiene: data files written by an attempt that did not
    commit (conflict OR any other error) are deleted before re-raising /
    retrying, so aborted mutations don't leak permanently-unreferenced
    parquet files (Delta reclaims those via VACUUM's directory listing;
    vacuum() here sweeps them too, as a crash backstop)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        for attempt in range(_COMMIT_RETRIES):
            self._op_files = []
            try:
                return fn(self, *args, **kwargs)
            except BaseException as exc:
                self._cleanup_op_files()
                if not isinstance(exc, CommitConflictError) or attempt == _COMMIT_RETRIES - 1:
                    raise
        raise AssertionError("unreachable")

    return wrapper


class CommitConflictError(RuntimeError):
    """Another writer published this version first (lost-update prevention).

    Mirrors Delta's ConcurrentModificationException: the caller should
    re-read the snapshot and retry the operation against the new state —
    a blind retry at version+1 could resurrect rows the competing commit
    removed."""


class ConstraintViolationError(RuntimeError):
    """A write produced rows that fail a table CHECK constraint.

    Mirrors Delta's InvariantViolationException: the transaction is aborted
    (no commit entry is published; the attempt's data files are cleaned up
    by the mutation wrapper) and the first offending row is reported."""


class MissingChangeDataError(ValueError):
    """A commit's row-level changes cannot be derived: the commit is a
    row-level op (MERGE/DELETE/UPDATE, or a DV mutation on pre-existing
    files) written WITHOUT materialized change data (``change_feed=True``).

    Subclasses ``ValueError`` for backward compatibility with callers that
    caught the untyped raise, but exists so incremental consumers (e.g.
    ``similarity.ivf_refresh``'s heal path) can catch exactly this case
    and let any FOREIGN ``ValueError`` from their fold chain propagate —
    a broad catch once silently degraded an O(changed rows) fold to an
    O(table) rescan on unrelated errors (round-12 verdict finding 1)."""


def _link_cas_publish(tmp: str, final: str) -> None:
    """Default commit publisher: atomic compare-and-swap on a POSIX
    filesystem. ``os.link`` fails with EEXIST when the version file already
    exists (unlike ``os.rename``, which silently overwrites — a lost
    update). Object-store deployments swap this hook for a conditional PUT
    (S3 If-None-Match) or a catalog CAS."""
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        os.remove(tmp)
        raise CommitConflictError(
            f"concurrent writer already committed {os.path.basename(final)}"
        ) from exc
    os.remove(tmp)


class ObjectStoreCasPublisher:
    """Commit publisher for stores WITHOUT atomic hard links (S3/GCS):
    the conditional-PUT contract. ``put_if_absent(key, data) -> bool``
    must atomically create ``key`` iff it does not exist (S3
    ``If-None-Match: *``, GCS ``ifGenerationMatch=0``, or a catalog/DynamoDB
    conditional write) and return False when it already does — that single
    primitive is all the commit protocol needs.

    The commit CONTENT travels inside the conditional put (not as a
    separate rename), so a writer crashing mid-publish can never claim a
    version number without its entry being readable — the failure mode a
    CAS-then-copy design would have. ``on_success`` (optional) mirrors the
    accepted entry to the locally-listable log (tests use it to keep the
    filesystem log authoritative; a real object-store deployment lists the
    store itself instead)."""

    def __init__(self, put_if_absent, on_success=None):
        self._put_if_absent = put_if_absent
        self._on_success = on_success

    def __call__(self, tmp: str, final: str) -> None:
        with open(tmp, "rb") as f:
            data = f.read()
        key = os.path.basename(final)
        won = self._put_if_absent(key, data)
        os.remove(tmp)
        if not won:
            raise CommitConflictError(
                f"concurrent writer already committed {key}"
            )
        if self._on_success is not None:
            self._on_success(final, data)


def resolve_commit_changes(
    commit: "_Commit",
    skip_change_commits: bool = False,
    table: "VintageTable | None" = None,
) -> tuple | None:
    """The ONE encoding of per-commit CDC semantics, shared by the batch
    reader (``VintageTable.table_changes``) and the streaming source
    (``streaming/vintage_source.py``) so the two can never drift:

    - ``None``: nothing to emit (dataChange=false, or a skipped/empty op);
    - ``("dir", rel_dir)``: materialized change rows (carry _change_type);
    - ``("files", [(rel_path, tag), ...], dv_ctx)``: file-level derivation —
      added DATA files are inserts, removed DATA files are deletes.
      ``dv_ctx = {"insert": [dv...], "delete": [dv...]}`` names the
      deletion-vector sidecars the reader must apply: removed files are
      read as of version-1 minus the DVs retired by this commit, added
      files as of version minus the DVs it introduces (a CLONE carrying
      translated DVs). DV sidecars are never emitted as rows themselves;
    - raises ``ValueError`` for a row-level op without materialized change
      data — or a commit whose DV changes aren't expressible as file
      actions (e.g. a RESTORE that un-deletes rows by retiring a DV while
      keeping its covered file) — unless ``skip_change_commits``.

    ``table`` supplies the root for the (tiny, metadata-plane) DV coverage
    reads; without it any DV-bearing file-level commit is treated as
    row-level. Exactness rests on the table invariant that a live DV's
    covered data files are live (every mutation either retires DVs with
    their files or materializes them first)."""
    if not commit.data_change:
        return None
    change_dir = commit.operation_parameters.get("changeData")
    if change_dir:
        return ("dir", change_dir)
    if commit.operation in ("MERGE", "DELETE", "UPDATE") and (commit.add or commit.remove):
        if skip_change_commits:
            return None
        raise MissingChangeDataError(
            f"version {commit.version} ({commit.operation}) has no "
            "materialized change data — create the table with "
            "change_feed=True, or skip such commits (skip_change_commits / "
            ".option('skipChangeCommits', 'true'))"
        )
    add_data, add_dvs = VintageTable._split_live(commit.add)
    rem_data, rem_dvs = VintageTable._split_live(commit.remove)
    dv_ctx = {"insert": [], "delete": []}
    if add_dvs or rem_dvs:
        if table is None:
            if skip_change_commits:
                return None
            raise MissingChangeDataError(
                f"version {commit.version} ({commit.operation}) touches "
                "deletion-vector sidecars; resolving its changes needs table "
                "context (pass table=) or skip_change_commits"
            )
        # A DV introduced here must only cover files added here (else it
        # row-deletes from pre-existing files with no file action); a DV
        # retired here must only cover files removed here (else it
        # un-deletes rows with no file action). Both checks normalize to
        # absolute paths because clone-translated DV refs are absolute.
        add_abs = {table._abs(f) for f in add_data}
        rem_abs = {table._abs(f) for f in rem_data}
        cov_add = table._dv_coverage(add_dvs)
        cov_rem = table._dv_coverage(rem_dvs)
        expressible = all(cov <= add_abs for cov in cov_add.values()) and all(
            cov <= rem_abs for cov in cov_rem.values()
        )
        if not expressible:
            if skip_change_commits:
                return None
            raise MissingChangeDataError(
                f"version {commit.version} ({commit.operation}) changes "
                "deletion vectors on files it does not add/remove — its "
                "row-level effect is not derivable from file actions; "
                "create the table with change_feed=True, or skip such "
                "commits (skip_change_commits / skipChangeCommits)"
            )
        dv_ctx = {"insert": sorted(add_dvs), "delete": sorted(rem_dvs)}
    actions = [(f, "insert") for f in add_data] + [(f, "delete") for f in rem_data]
    return ("files", actions, dv_ctx) if actions else None


def _read_footer_stats(abs_path: str) -> dict:
    """Zone map for one parquet file from its footer (metadata-only read).
    Module-level so executors can run it by reference when a commit is big
    enough to fan stats collection out (see ``_collect_stats``).

    A column's file-level range is only usable if EVERY row group supplied
    valid min/max — a partial range (some row groups omitted stats for
    oversized/non-UTF8 values) would let ``_prune_by_range`` skip a file
    that actually contains matches, and a merge would then miss rows it
    must rewrite."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    unusable: set[str] = set()
    null_unusable: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            st = col.statistics
            # per-column null counts (Delta stats' nullCount: IS NULL /
            # IS NOT NULL skipping) — usable only if EVERY row group
            # recorded one
            if st is not None and st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            else:
                null_unusable.add(name)
            lo = hi = None
            if st is not None and st.has_min_max:
                try:
                    lo, hi = st.min, st.max
                except Exception:
                    # pyarrow can't decode stats for every physical/logical
                    # type combination (e.g. some decimals); stats are an
                    # optimization — an unusable column must never fail the
                    # write that triggered collection
                    lo = hi = None
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                    except UnicodeDecodeError:
                        lo = None
            if lo is None or not isinstance(lo, (int, float, str)):
                unusable.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    for name in unusable:
        mins.pop(name, None)
        maxs.pop(name, None)
    for name in null_unusable:
        nulls.pop(name, None)
    return {"rows": md.num_rows, "min": mins, "max": maxs, "nulls": nulls}


@dataclass
class _Commit:
    version: int
    timestamp: float
    operation: str
    operation_parameters: dict
    add: list[str]
    remove: list[str]
    data_change: bool = True
    schema_json: str | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "timestamp": self.timestamp,
                "operation": self.operation,
                "operationParameters": self.operation_parameters,
                "add": self.add,
                "remove": self.remove,
                "dataChange": self.data_change,
                "schemaJson": self.schema_json,
            }
        )

    @staticmethod
    def from_json(s: str) -> "_Commit":
        d = json.loads(s)
        return _Commit(
            version=d["version"],
            timestamp=d["timestamp"],
            operation=d["operation"],
            operation_parameters=d.get("operationParameters", {}),
            add=d.get("add", []),
            remove=d.get("remove", []),
            data_change=d.get("dataChange", True),
            schema_json=d.get("schemaJson"),
        )


class VintageTable:
    """A versioned parquet table with Delta-like mutation semantics."""

    def __init__(
        self, spark: SparkSession, path: str, commit_hook=None, change_feed: bool = False
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        # pluggable CAS seam: (tmp_path, final_path) -> None, atomic, raises
        # CommitConflictError if final_path was already published
        self._publish = commit_hook or _link_cas_publish
        # Delta's delta.enableChangeDataFeed: row-level ops (merge/delete/
        # update) additionally persist their change rows under _change_data/
        # so CDC readers (table_changes / the vintage_cdc stream source)
        # never re-derive them by diffing. Off by default — it costs one
        # extra O(changed rows) write per mutation.
        self.change_feed = change_feed
        # data files written by the in-flight mutation attempt; cleaned up
        # by _retry_conflicts if the attempt fails to commit
        self._op_files: list[str] = []

    # ------------------------------------------------------------------ log

    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def _commits(self, after: int = -1, up_to: int | None = None) -> list[_Commit]:
        """Commit entries with ``after < version [<= up_to]``, in version
        order. Passing a checkpoint version keeps log replay
        O(commits-since-checkpoint) instead of O(all versions) — at one
        merge/minute a year-old table has ~500k commits, and reading them
        all per snapshot is the driver bottleneck Delta's
        ``_last_checkpoint`` exists to avoid. ``up_to`` bounds the other
        side: a capped streaming source replaying a deep backlog parses
        only its (start, end] batch instead of the whole remaining log
        per trigger."""
        log_dir = self._log_path()
        if not os.path.isdir(log_dir):
            return []
        out = []
        for fname in sorted(os.listdir(log_dir)):
            # commit entries only (8-digit version); skips file_stats.json etc.
            if fname.endswith(".json") and fname[:-5].isdigit():
                v = int(fname[:-5])
                if v <= after or (up_to is not None and v > up_to):
                    continue
                with open(os.path.join(log_dir, fname)) as f:
                    out.append(_Commit.from_json(f.read()))
        return out

    def _commit_versions(self) -> list[int]:
        """Commit version numbers from filenames alone — no JSON parsing, so
        the write path stays O(listdir) regardless of log length."""
        log_dir = self._log_path()
        if not os.path.isdir(log_dir):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def exists(self) -> bool:
        return bool(self._commit_versions())

    def latest_version(self) -> int:
        versions = self._commit_versions()
        if not versions:
            raise FileNotFoundError(f"no vintage table at {self.path}")
        return versions[-1]

    # ---------------------------------------------------------- checkpoints

    def _checkpoint_versions(self) -> list[int]:
        log_dir = self._log_path()
        if not os.path.isdir(log_dir):
            return []
        suffix = ".checkpoint.json"
        return sorted(
            int(f[: -len(suffix)])
            for f in os.listdir(log_dir)
            if f.endswith(suffix) and f[: -len(suffix)].isdigit()
        )

    def _load_checkpoint(
        self, version: int | None = None, timestamp: float | None = None
    ) -> dict | None:
        """Newest checkpoint at or before the target version/timestamp."""
        for v in reversed(self._checkpoint_versions()):
            if version is not None and v > version:
                continue
            path = os.path.join(self._log_path(), f"{v:08d}.checkpoint.json")
            try:
                with open(path) as f:
                    ckpt = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            if timestamp is not None and ckpt["timestamp"] > timestamp:
                continue
            return ckpt
        return None

    def checkpoint(self) -> int:
        """Materialize the current snapshot's state (live file set + schema)
        so later reads replay only commits AFTER this version — Delta's
        ``_last_checkpoint`` mechanism. Written automatically every
        ``_CHECKPOINT_EVERY`` commits; safe to call any time. Returns the
        checkpointed version."""
        v = self.latest_version()
        entry = self._commits(after=v - 1)[0]
        payload = {
            "version": v,
            "timestamp": entry.timestamp,
            "live": self._live_files(version=v),
            "schemaJson": self._schema_at(version=v).json(),
        }
        final = os.path.join(self._log_path(), f"{v:08d}.checkpoint.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.rename(tmp, final)  # atomic publish
        return v

    def _live_files(self, version: int | None = None, timestamp: float | None = None) -> list[str]:
        ckpt = self._load_checkpoint(version=version, timestamp=timestamp)
        commits = self._commits(after=ckpt["version"] if ckpt else -1)
        if not commits and ckpt is None:
            raise FileNotFoundError(f"no vintage table at {self.path}")
        if timestamp is not None:
            eligible = [c for c in commits if c.timestamp <= timestamp]
            if not eligible and ckpt is None:
                raise ValueError(f"no version at or before timestamp {timestamp}")
            version = eligible[-1].version if eligible else ckpt["version"]
        live: set[str] = set(ckpt["live"]) if ckpt else set()
        for c in commits:
            if version is not None and c.version > version:
                break
            live.difference_update(c.remove)
            live.update(c.add)
        return sorted(live)

    def _version_at(self, timestamp: float) -> int:
        """The version in effect at ``timestamp`` (same resolution rule as
        ``_live_files``): the newest commit at or before it."""
        ckpt = self._load_checkpoint(timestamp=timestamp)
        commits = self._commits(after=ckpt["version"] if ckpt else -1)
        eligible = [c for c in commits if c.timestamp <= timestamp]
        if not eligible and ckpt is None:
            raise ValueError(f"no version at or before timestamp {timestamp}")
        return eligible[-1].version if eligible else ckpt["version"]

    def _next_version(self) -> int:
        versions = self._commit_versions()
        return versions[-1] + 1 if versions else 0

    def _commit(
        self,
        operation: str,
        params: dict,
        add: list[str],
        remove: list[str],
        data_change: bool = True,
        schema_json: str | None = None,
    ) -> int:
        tid = (params or {}).get("txnId")
        if tid is not None and str(tid).count(":") > 1:
            # the app-scoped watermark contract encodes '<app>:<version>';
            # a token with several colons is ambiguous under prefix
            # matching (app 'a' would read token 'a:b:5' as version
            # 'b:5' and crash int() in the streaming folds) — reject at
            # the ONE place every txn token passes through
            raise ValueError(
                f"txn_id {tid!r} contains more than one ':' — ambiguous "
                "against the '<app>:<version>' scoped-watermark encoding "
                "(see last_txn_id)"
            )
        version = self._next_version()
        entry = _Commit(
            version=version,
            timestamp=time.time(),
            operation=operation,
            operation_parameters=params,
            add=add,
            remove=remove,
            data_change=data_change,
            schema_json=schema_json,
        )
        log_dir = self._log_path()
        os.makedirs(log_dir, exist_ok=True)
        final = os.path.join(log_dir, f"{version:08d}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(entry.to_json())
        # CAS publish: exactly one writer wins each version number
        self._publish(tmp, final)
        # The commit is durable from here: the published entry references
        # this attempt's files, so failure-cleanup must never touch them —
        # a post-publish exception (e.g. checkpoint IO) would otherwise
        # delete data a committed version points at.
        self._op_files = []
        if version > 0 and version % _CHECKPOINT_EVERY == 0:
            try:
                self.checkpoint()
            except OSError:
                # checkpoints are an optimization (bounded log replay);
                # the commit itself already succeeded, and the next
                # checkpoint interval retries
                pass
        return version

    # ----------------------------------------------------------------- data

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df as parquet into a fresh immutable commit directory and
        return the relative paths of the produced data files."""
        commit_dir = f"{_DATA_DIR}/c{uuid.uuid4().hex}"
        abs_dir = os.path.join(self.path, commit_dir)
        # a rewrite sourced from a per-file-constant attach still carries
        # the materialized _metadata helper — never persist it
        df = df.drop("_metadata")
        try:
            self._with_constraint_checks(df).write.mode("errorifexists").parquet(abs_dir)
        except Exception as exc:  # unwrap the in-flight CHECK failure
            if "CHECK constraint" in str(exc):
                raise ConstraintViolationError(str(exc).split("\n")[0]) from exc
            raise
        files = [
            f"{commit_dir}/{fname}"
            for fname in sorted(os.listdir(abs_dir))
            if fname.endswith(".parquet")
        ]
        stats = self._collect_stats(files)
        # Empty partitions produce zero-row part files — drop them at the
        # source (small-file hygiene, and delete() needs no extra isEmpty
        # job: a delete-everything rewrite simply adds no files).
        keep = []
        for f in files:
            if stats.get(f, {}).get("rows", 1) == 0:
                os.remove(os.path.join(self.path, f))
            else:
                keep.append(f)
        if not keep:
            # an all-empty write (e.g. a delete that emptied every touched
            # file) leaves only _SUCCESS markers: no commit references the
            # dir, so drop it rather than accrete garbage dirs
            import shutil

            shutil.rmtree(abs_dir, ignore_errors=True)
            stats2 = self._file_stats()
            if any(f in stats2 for f in files):
                for f in files:
                    stats2.pop(f, None)
                tmp = self._stats_path() + f".tmp-{uuid.uuid4().hex}"
                with open(tmp, "w") as fh:
                    json.dump(stats2, fh)
                os.rename(tmp, self._stats_path())
        self._op_files.extend(keep)
        return keep

    def _cleanup_op_files(self) -> None:
        """Delete data files written by a mutation attempt that failed to
        commit (no log entry references them), plus their stats entries and
        now-empty commit directories."""
        files, self._op_files = self._op_files, []
        if not files:
            return
        import shutil

        for f in files:
            try:
                os.remove(os.path.join(self.path, f))
            except OSError:
                pass
        # each attempt writes into fresh uuid directories nothing else uses,
        # so the whole dir goes (rmdir alone would trip on _SUCCESS markers)
        for d in {os.path.dirname(f) for f in files}:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        stats = self._file_stats()
        if any(f in stats for f in files):
            for f in files:
                stats.pop(f, None)
            tmp = self._stats_path() + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                json.dump(stats, fh)
            os.rename(tmp, self._stats_path())

    def _write_change_data(self, changes: DataFrame | None) -> str | None:
        """Persist a mutation's change rows (must carry ``_change_type``)
        under ``_change_data/`` and return the directory's relative path for
        the commit record — Delta's CDF ``_change_data`` mechanism. The
        write is executor-side and O(changed rows); files are tracked in
        ``_op_files`` so a failed commit reclaims them."""
        if changes is None or not self.change_feed:
            return None
        rel_dir = f"{_CHANGE_DIR}/c{uuid.uuid4().hex}"
        abs_dir = os.path.join(self.path, rel_dir)
        changes = changes.drop("_metadata")
        changes.write.mode("errorifexists").parquet(abs_dir)
        files = [
            f"{rel_dir}/{f}" for f in sorted(os.listdir(abs_dir)) if f.endswith(".parquet")
        ]
        self._op_files.extend(files)
        if not files:
            # a zero-partition change frame wrote no part files; recording
            # the dir would make CDC readers choke on schema inference
            import shutil

            shutil.rmtree(abs_dir, ignore_errors=True)
            return None
        return rel_dir

    def _write_data_and_changes(
        self, new_data: DataFrame, changes: DataFrame | None
    ) -> tuple[list[str], str | None]:
        """Run a mutation's data-file write and change-data write as
        CONCURRENT Spark jobs and return ``(add, change_dir)``. The two
        writes are independent frames whose only meeting point is the
        commit record, and Spark happily runs several jobs at once — the
        CDC job's tasks back-fill executors the data write's stage tail
        leaves idle, hiding the smaller job's wall time entirely (at
        100 TB the CDC write is O(changed rows) against a data write of
        O(touched files); at bench scale it hides one of two
        fixed-overhead jobs per commit).

        Crash safety is unchanged: the commit's atomicity point is the
        log publish in ``_commit``, which the caller reaches only after
        BOTH writes returned, so both file sets are durable — and tracked
        in ``_op_files`` for failure cleanup (list.extend is atomic under
        the GIL) — before any reader can learn of them. An exception from
        either write propagates only after the other has finished, so
        ``_retry_conflicts``' cleanup never races a live write.

        Callers must pin any shared NONDETERMINISTIC lineage (eagerly
        materialized checkpoint) before calling: with lazy checkpoints
        the two jobs could race the first materialization and each
        evaluate the source independently — exactly the CDC/table
        divergence the merge checkpoint exists to prevent.
        """
        if changes is None or not self.change_feed:
            return self._write_files(new_data), None
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        try:
            fut = pool.submit(self._write_change_data, changes)
            add = self._write_files(new_data)
            return add, fut.result()
        finally:
            pool.shutdown(wait=True)

    def _stats_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR, "file_stats.json")

    # Below this many new files, footer reads happen in a driver loop: a
    # local/shared-FS footer read is ~1-50 ms, so a handful of serial reads
    # beats one Spark job's scheduling overhead. Above it, footers are read
    # executor-side in parallel — O(files) work spread over the cluster, the
    # driver only collects the (small) aggregated zone maps, mirroring how
    # Delta gathers per-file stats from the write tasks rather than looping
    # on the driver.
    _DRIVER_STATS_MAX = 32

    # Max distinct values for dictionary-rank Z-order buckets on a string
    # column; the driver holds one sorted list this size per compact() call.
    _Z_DICT_MAX = 1024

    def _collect_stats(self, files: list[str]) -> dict:
        """Record per-file zone maps (row count + per-column min/max) from
        the parquet footers — metadata-only reads, the same stats Delta
        keeps in its log. Used for file skipping. Returns the full stats
        map. Large commits fan the footer reads out to executors (see
        ``_DRIVER_STATS_MAX``); a 100 TB write's stats collection is then
        bounded by cluster parallelism, not driver round-trips."""
        stats = self._file_stats()
        if len(files) > self._DRIVER_STATS_MAX:
            sc = self.spark.sparkContext
            root = self.path
            n_parts = max(1, min(len(files) // 8 + 1, sc.defaultParallelism * 4))
            pairs = (
                sc.parallelize(files, n_parts)
                .map(lambda rel: (rel, _read_footer_stats(os.path.join(root, rel))))
                .collect()
            )
            stats.update(dict(pairs))
        else:
            for rel in files:
                stats[rel] = _read_footer_stats(os.path.join(self.path, rel))
        tmp = self._stats_path() + f".tmp-{uuid.uuid4().hex}"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.rename(tmp, self._stats_path())
        return stats

    def _file_stats(self) -> dict:
        try:
            with open(self._stats_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    # --------------------------------------------- per-file constant columns

    def _partitions_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR, "file_partitions.json")

    def _file_partitions(self) -> dict:
        """Per-file CONSTANT column values (relative file -> {column: raw
        string}), the vintage translation of Delta's log-carried
        partitionValues: a zero-copy import of a partitioned Delta table
        points at raw files that do not contain their partition columns,
        so reads re-attach them from this sidecar. Vintage's own writes
        always materialize every column, so entries exist only for
        imported refs; a table without the sidecar pays zero plan or IO
        cost (the common case short-circuits on file existence)."""
        try:
            with open(self._partitions_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _attach_file_partitions(
        self, df: DataFrame, relevant: dict, version: int | None
    ) -> DataFrame:
        """Re-attach log-carried constant columns to a raw-file scan via a
        broadcast (absolute file -> values) map join — ONE scan node and
        O(imported files) driver metadata however many partitions the
        source table had (the same mechanism DeltaTableReader uses).
        Values are stored as Delta's partition-value strings and cast
        through the table schema's types; files that already materialize
        a column inline (post-import rewrites) win via coalesce."""
        from pyspark.sql.types import StringType, StructField, StructType

        schema = self._schema_at(version)
        types = {f.name: f.dataType for f in schema.fields}
        cols = [
            f.name
            for f in schema.fields
            if any(f.name in vals for vals in relevant.values())
        ]
        if not cols:
            return df
        from sdlt_spark.store.paths import decoded_file_path

        # materialize the hidden _metadata column as a regular one FIRST:
        # downstream consumers (_with_file, _with_dv_key) resolve
        # _metadata.file_path against it, which the hidden column cannot
        # provide once this join's projections consume it. Public reads
        # and file writes drop it at their boundary.
        df = df.withColumn("_metadata", F.col("_metadata"))
        key = decoded_file_path(F.col("_metadata.file_path"))
        rows = [
            (self._abs(rel), *[vals.get(c) for c in cols])
            for rel, vals in relevant.items()
        ]
        pmap = self.spark.createDataFrame(
            rows,
            StructType(
                [StructField("__fp_path", StringType(), False)]
                + [StructField(f"__fp_{c}", StringType(), True) for c in cols]
            ),
        ).select(
            "__fp_path",
            *[F.col(f"__fp_{c}").cast(types[c]).alias(f"__fp_{c}") for c in cols],
        )
        df = df.withColumn("__fp_path", key).join(
            F.broadcast(pmap), "__fp_path", "left"
        )
        for c in cols:
            attached = F.col(f"__fp_{c}")
            df = df.withColumn(
                c, F.coalesce(F.col(c), attached) if c in df.columns else attached
            )
        df = df.drop("__fp_path", *[f"__fp_{c}" for c in cols])
        # present the declared column order when the sets line up (imported
        # tables); leave evolved/extra columns where mergeSchema put them
        if set(df.columns) - {"_metadata"} == {f.name for f in schema.fields}:
            df = df.select(*[f.name for f in schema.fields], "_metadata")
        return df

    def _prune_by_range(self, files: list[str], col: str, lo, hi) -> list[str]:
        """Keep only files whose [min, max] zone for ``col`` overlaps
        [lo, hi] (either bound ``None`` = unbounded on that side); files
        without stats are always kept (over-approximation preserves
        correctness)."""
        stats = self._file_stats()
        out = []
        for f in files:
            st = stats.get(f)
            if not st or col not in st.get("min", {}) or col not in st.get("max", {}):
                out.append(f)
                continue
            try:
                keep = (lo is None or st["max"][col] >= lo) and (
                    hi is None or st["min"][col] <= hi
                )
            except TypeError:
                # zone value and bound are not comparable (e.g. a string
                # date zone from an imported Delta table vs a datetime
                # bound): the zone is unusable for THIS query — keep the
                # file, never crash the read
                keep = True
            if keep:
                out.append(f)
        return out

    def _schema_at(self, version: int | None = None):
        from pyspark.sql.types import StructType

        ckpt = self._load_checkpoint(version=version)
        last = ckpt["schemaJson"] if ckpt else None
        for c in self._commits(after=ckpt["version"] if ckpt else -1):
            if version is not None and c.version > version:
                break
            if c.schema_json:
                last = c.schema_json
        if last is None:
            raise FileNotFoundError(f"no schema recorded for table at {self.path}")
        return StructType.fromJson(json.loads(last))

    def _read_files(self, files: list[str], version: int | None = None) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], self._schema_at(version))
        paths = [os.path.join(self.path, f) for f in files]
        # mergeSchema tolerates schema evolution across commits (README.md:330)
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        pmap = self._file_partitions()
        if pmap:
            fset = set(files)
            relevant = {rel: vals for rel, vals in pmap.items() if rel in fset}
            if relevant:
                df = self._attach_file_partitions(df, relevant, version)
        return df

    @staticmethod
    def _with_file(df: DataFrame) -> DataFrame:
        return df.withColumn("__file", F.col("_metadata.file_path"))

    def _rel(self, file_uri: str) -> str:
        import urllib.parse as _urlparse

        p = file_uri
        if p.startswith("file:"):
            p = p[len("file:") :]
            while p.startswith("//"):
                p = p[1:]
        # Spark reports file paths URI-escaped (space -> %20 etc.; '+'
        # stays raw, which unquote also leaves alone) — decode so the
        # result matches on-disk names; every caller passes
        # _metadata/inputFiles-derived URIs (see _rel_path_col, the
        # executor-side twin with the same decode)
        return os.path.relpath(_urlparse.unquote(p), self.path)

    # ------------------------------------------------- deletion vectors

    @staticmethod
    def _split_live(files: list[str]) -> tuple[list[str], list[str]]:
        """Partition a live-file list into (data files, deletion-vector
        files) — DVs are tracked in the same commit add/remove lists and
        distinguished by their ``dv/`` prefix."""
        data = [f for f in files if not f.startswith(f"{_DV_DIR}/")]
        dvs = [f for f in files if f.startswith(f"{_DV_DIR}/")]
        return data, dvs

    def _abs(self, rel: str) -> str:
        """Canonical absolute path for a table-relative file reference
        (shallow-clone entries contain ``..`` segments; normpath folds them
        so paths compare equal however they were derived)."""
        return os.path.normpath(os.path.join(self.path, rel))

    def _live_data_bytes(
        self, stop_at: int | None = None, live: list[str] | None = None
    ) -> int:
        """Total bytes of the live data files, from driver-side file stats
        (no Spark job). Feeds size gates that pick a plan shape — e.g.
        whether a merge's zone-map pruning aggregate can pay for itself.
        Unstat-able files (remote store) count as large so gates fail
        toward the scale-safe plan.

        ``stop_at`` short-circuits once the running total crosses it: gate
        callers only need the boolean, and at the 100 TB / O(100k-files)
        design point a handful of stats answers it instead of O(files)
        driver syscalls per merge (ADVICE round 13). ``live`` lets a
        caller that already replayed the commit log pass its file list in
        rather than paying a second ``_live_files()`` replay."""
        data, _ = self._split_live(self._live_files() if live is None else live)
        total = 0
        for f in data:
            try:
                total += os.path.getsize(self._abs(f))
            except OSError:
                return 1 << 60
            if stop_at is not None and total >= stop_at:
                return total
        return total

    def _dv_coverage(self, dv_files: list[str]) -> dict[str, set[str]]:
        """Absolute paths of the data files each deletion-vector sidecar
        covers. Metadata-plane: DV files are O(deleted rows) tiny, read
        with pyarrow so session-less contexts (the streaming source's
        driver) can call it. DV ``file`` refs are table-relative, except
        clone-translated ones which are absolute (see :meth:`clone`)."""
        import pyarrow.parquet as pq

        out: dict[str, set[str]] = {}
        for f in dv_files:
            refs = (
                pq.read_table(self._abs(f), columns=["file"])
                .column("file")
                .to_pylist()
            )
            out[f] = {
                r if os.path.isabs(r) else self._abs(r) for r in set(refs)
            }
        return out

    def _rel_path_col(self):
        """Table-relative path of the row's source file as a Column (the
        executor-side twin of :meth:`_rel`): decode the URI escaping
        ``_metadata.file_path`` reports (space -> %20, # -> %23, literal
        % -> %25; ``+`` stays raw, hence the %2B protection before the
        form-decoding url_decode), strip the file: scheme, then the table
        root prefix. Vintage's own generated file names are hex-safe, but
        out-of-root refs (clone / Delta import) can carry arbitrary
        names — an undecoded key would silently miss the DV anti-join.
        The decode itself lives once in
        :func:`sdlt_spark.store.paths.decoded_file_path`."""
        import re as _re

        from sdlt_spark.store.paths import decoded_file_path

        fp = decoded_file_path(F.col("_metadata.file_path"))
        root = self.path.rstrip("/") + "/"
        return F.regexp_replace(fp, "^" + _re.escape(root), "")

    def _with_dv_key(self, df: DataFrame) -> DataFrame:
        """Attach the (relative file, row position) identity columns the
        deletion-vector anti-join keys on. ``_metadata.row_index`` is
        stable for immutable parquet files — the same contract Delta's DVs
        rely on."""
        return df.withColumn("__dv_file", self._rel_path_col()).withColumn(
            "__dv_pos", F.col("_metadata.row_index")
        )

    def _apply_dvs(self, df: DataFrame, dv_files: list[str]) -> DataFrame:
        """Filter out rows named by the given deletion-vector files. The DV
        side is O(deleted rows) — typically tiny next to the table — and
        carries 16-byte pairs; no broadcast hint (AQE broadcasts iff it
        fits). No-op (and no plan change) when no DVs are live."""
        if not dv_files:
            return df
        dv = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in dv_files]
        ).select("file", "pos")
        keyed = self._with_dv_key(df)
        return keyed.join(
            dv,
            (keyed["__dv_file"] == dv["file"]) & (keyed["__dv_pos"] == dv["pos"]),
            "left_anti",
        ).drop("__dv_file", "__dv_pos")

    def _write_dv_files(self, dv_rows: DataFrame) -> list[str]:
        """Persist (file, pos) deletion-vector rows under dv/ and return
        their relative paths (op-file-tracked for failure cleanup)."""
        import shutil

        import pyarrow.parquet as pq

        rel_dir = f"{_DV_DIR}/c{uuid.uuid4().hex}"
        abs_dir = os.path.join(self.path, rel_dir)
        # one sidecar per delete (Delta's shape): DV row counts are the
        # op's matched rows — small next to the table — and a single file
        # keeps the read-path dv listing O(delete ops)
        dv_rows.coalesce(1).write.mode("errorifexists").parquet(abs_dir)
        files = []
        for f in sorted(os.listdir(abs_dir)):
            if not f.endswith(".parquet"):
                continue
            if pq.read_metadata(os.path.join(abs_dir, f)).num_rows == 0:
                os.remove(os.path.join(abs_dir, f))  # no-match delete
            else:
                files.append(f"{rel_dir}/{f}")
        self._op_files.extend(files)
        if not files:
            shutil.rmtree(abs_dir, ignore_errors=True)
        return files

    def _delete_dv(self, condition: str) -> int:
        """Merge-on-read delete: record matched row positions as a
        deletion-vector sidecar instead of rewriting data files — Delta's
        deletion-vector write path. O(matched rows) written, zero data
        files touched; readers apply the DV as an anti-join until a
        mutation or compact() materializes it."""
        live = self._live_files()
        data, dvs = self._split_live(live)
        cond = F.expr(condition)
        if not data:
            return self._commit(
                "DELETE", {"predicate": condition, "deletionVectors": "true"}, [], []
            )
        # already-deleted rows are excluded first, so re-deleting is a no-op
        snap = self._with_dv_key(self._read_files(data))
        if dvs:
            prior = self.spark.read.parquet(
                *[os.path.join(self.path, f) for f in dvs]
            ).select("file", "pos")
            snap = snap.join(
                prior,
                (snap["__dv_file"] == prior["file"])
                & (snap["__dv_pos"] == prior["pos"]),
                "left_anti",
            )
        matched = snap.filter(cond)
        if self.change_feed:
            matched = matched.localCheckpoint(eager=False)
        add = self._write_dv_files(
            matched.select(
                F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
            )
        )
        change_dir = self._write_change_data(
            matched.drop("__dv_file", "__dv_pos").withColumn(
                "_change_type", F.lit("delete")
            )
            if self.change_feed
            else None
        )
        params = {"predicate": condition, "deletionVectors": "true"}
        if change_dir:
            params["changeData"] = change_dir
        return self._commit("DELETE", params, add, [])

    @_retry_conflicts
    def materialize_deletion_vectors(self) -> int | None:
        """Rewrite the data files covered by live deletion vectors with
        their deleted rows dropped, and retire the DV sidecars — Delta's
        REORG TABLE APPLY (PURGE). Logical content is unchanged, so the
        commit is dataChange=false (CDC readers skip it). Returns the new
        version, or None when no DVs are live. Copy-on-write mutations call
        this implicitly (before writing any files of their own, which is
        what makes the nested ``_retry_conflicts`` safe) so their
        file-level row handling never resurrects DV-deleted rows; cost is
        O(covered files), not O(table)."""
        live = self._live_files()
        data, dvs = self._split_live(live)
        if not dvs:
            return None
        covered_abs = set().union(*self._dv_coverage(dvs).values())
        covered = sorted(f for f in data if self._abs(f) in covered_abs)
        add = (
            self._write_files(self._apply_dvs(self._read_files(covered), dvs))
            if covered
            else []  # DVs referencing no live file (e.g. all-empty) just retire
        )
        return self._commit(
            "WRITE",
            {"mode": "Overwrite", "dataChange": "false", "materializeDeletionVectors": "true"},
            add,
            covered + dvs,
            data_change=False,
        )

    # ---------------------------------------------------------------- reads

    def read(
        self, version: int | None = None, timestamp: float | None = None
    ) -> DataFrame:
        """Snapshot read; ``version``/``timestamp`` give time travel
        (README.md:169 ``versionAsOf`` / README.md:166 ``timestampAsOf``).
        Live deletion vectors (``delete(mode='dv')``) are applied as an
        anti-join — zero plan change when none exist."""
        files = self._live_files(version=version, timestamp=timestamp)
        data, dvs = self._split_live(files)
        df = self._read_files(data, version=version)
        # empty-table reads have no _metadata columns to key on (and no
        # rows a DV could remove). The drop sheds the materialized helper
        # column a per-file-constant attach leaves behind (no-op elsewhere).
        return (self._apply_dvs(df, dvs) if data else df).drop("_metadata")

    def read_where(self, col: str, lo=None, hi=None, version: int | None = None) -> DataFrame:
        """Data-skipping range read (Delta's read-path file skipping): only
        files whose zone map for ``col`` overlaps [lo, hi] (``None`` =
        unbounded) are listed for the scan, then the exact row predicate
        still applies — zone maps are file-granular over-approximations.

        Composes with parquet row-group pushdown inside the surviving
        files. On a table written with ``write(cluster_by=[col])`` or
        reorganized by ``compact(sort_by/zorder_by)`` a narrow range
        touches O(matching) files regardless of table size — the property
        that makes point-ish reads on a 100 TB table not be table scans."""
        data, dvs = self._split_live(self._live_files(version=version))
        files = self._prune_by_range(data, col, lo, hi)
        df = self._read_files(files, version=version)
        # DV entries for pruned-out files simply never match the anti-join
        if files:
            df = self._apply_dvs(df, dvs)
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df.drop("_metadata")

    def history(self) -> DataFrame:
        """Version log, newest first (README.md:305-319)."""
        rows = [
            (
                c.version,
                # match Delta's history(): a timestamp column
                time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(c.timestamp)),
                c.operation,
                json.dumps(c.operation_parameters),
                c.data_change,
            )
            for c in reversed(self._commits())
        ]
        return self.spark.createDataFrame(
            rows, "version LONG, timestamp STRING, operation STRING, operationParameters STRING, dataChange BOOLEAN"
        )

    # ---------------------------------------------------------- constraints

    def constraints(self) -> dict[str, str]:
        """Active CHECK constraints (name -> SQL predicate), derived by
        replaying the commit log. The log is metadata-sized and never
        truncated, so a full replay is O(commits) driver work — the same
        cost class as listing versions; no checkpoint integration needed."""
        out: dict[str, str] = {}
        for c in self._commits():
            if c.operation == "ADD CONSTRAINT":
                out[c.operation_parameters["name"]] = c.operation_parameters["expr"]
            elif c.operation == "DROP CONSTRAINT":
                out.pop(c.operation_parameters["name"], None)
        return out

    @_retry_conflicts
    def add_constraint(self, name: str, expr: str) -> int:
        """Delta's ``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``: the
        predicate must hold on every EXISTING row (validated with one scan
        here, exactly as Delta does) and every future write enforces it
        in-flight (see ``_write_files``). SQL-standard CHECK semantics: a
        row passes when the predicate is TRUE or NULL (unknown)."""
        if name in self.constraints():
            raise ValueError(f"constraint {name!r} already exists")
        ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        n_bad = self.read().filter(~ok).count()
        if n_bad:
            raise ConstraintViolationError(
                f"cannot add constraint {name!r}: {n_bad} existing row(s) "
                f"violate CHECK ({expr})"
            )
        return self._commit(
            "ADD CONSTRAINT", {"name": name, "expr": expr}, [], [], data_change=False
        )

    @_retry_conflicts
    def drop_constraint(self, name: str) -> int:
        if name not in self.constraints():
            raise KeyError(f"no constraint {name!r}")
        return self._commit(
            "DROP CONSTRAINT", {"name": name}, [], [], data_change=False
        )

    def _with_constraint_checks(self, df: DataFrame) -> DataFrame:
        """Fold CHECK enforcement into the write pipeline itself: each
        constraint becomes a ``filter(assert_true(ok).isNull())`` stage that
        passes every valid row through and throws on the first violation —
        so enforcement runs inside the write job (Delta's
        InvariantCheckerExec), costs one predicate eval per row, and adds
        ZERO extra scans of the input lineage. The error message (offending
        row as JSON) is only evaluated on the failing row."""
        if not self.exists():
            return df
        for name, expr in self.constraints().items():
            try:
                ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
                df.select(ok)  # analyze now: fail fast with a clear message
            except Exception as exc:
                raise ConstraintViolationError(
                    f"write schema is incompatible with CHECK constraint "
                    f"{name!r} ({expr}): {exc}"
                ) from exc
            msg = F.concat(
                F.lit(f"CHECK constraint {name} ({expr}) violated by row: "),
                F.to_json(F.struct(*[F.col(c) for c in df.columns])),
            )
            df = df.filter(F.assert_true(ok, msg).isNull())
        return df

    # --------------------------------------------------------------- writes

    @_retry_conflicts
    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        cluster_by: list[str] | None = None,
        num_files: int | None = None,
        txn_id: str | None = None,
        replace_where: str | None = None,
    ) -> int:
        """Full write. ``overwrite`` = reference full replacement
        (README.md:175-199); history is preserved, old files stay for time
        travel until vacuumed.

        ``replace_where`` (Delta's ``replaceWhere`` option) scopes the
        overwrite to the predicate: rows matching it are replaced by
        ``df``, everything else is untouched — the idempotent
        partition/date-range reload pattern ("recompute yesterday") that a
        full overwrite would turn into an O(table) rewrite. Only files
        containing matching rows are rewritten; incoming rows must ALL
        satisfy the predicate (Delta's constraint — a stray row outside
        the reload window would silently corrupt untouched history).

        ``txn_id`` records an idempotence token in the commit's operation
        parameters (Delta's ``txnAppId/txnVersion`` pattern): a sink that
        may replay its writes (foreachBatch after a crash between the
        table commit and the stream checkpoint) checks
        :meth:`last_txn_id` and skips already-applied batches.

        ``cluster_by`` clusters the data AT INGEST: range-repartition +
        sort-within-partitions on the given columns, so each file owns a
        narrow zone of the leading cluster key and zone maps prune scans
        and merge rewrites immediately — no post-hoc compact() needed.
        This is the scale replacement for Hive-style partitionBy: same
        pruning effect on selective predicates, but high-cardinality keys
        can't explode into millions of directories (file count stays
        ``num_files``, default the session shuffle parallelism)."""
        if mode not in ("overwrite", "append", "errorifexists"):
            raise ValueError(f"unsupported mode {mode!r}")
        if replace_where is not None:
            if mode != "overwrite":
                raise ValueError("replace_where requires mode='overwrite'")
            return self._replace_where(
                df, replace_where, cluster_by, num_files, txn_id
            )
        if cluster_by:
            nf = num_files or int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
            df = df.repartitionByRange(nf, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        if mode == "errorifexists" and self.exists():
            raise FileExistsError(self.path)
        if mode == "append" and self.exists():
            # Delta errors on schema-mismatched appends (README.md:327);
            # overwrite replaces the schema, append must conform — names AND
            # types (a name-only check would let a string o_totalprice land
            # and corrupt every later mergeSchema read).
            current = {f.name: f.dataType.simpleString() for f in self._schema_at().fields}
            incoming = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            if incoming != current:
                raise ValueError(
                    f"append schema mismatch: table has {sorted(current.items())}, "
                    f"dataframe has {sorted(incoming.items())}; use merge(..., "
                    f"schema_evolution=True) or mode='overwrite' to evolve"
                )
        add = self._write_files(df)
        remove = self._live_files() if (mode == "overwrite" and self.exists()) else []
        params = {"mode": "Overwrite" if mode == "overwrite" else mode.title()}
        if txn_id is not None:
            params["txnId"] = str(txn_id)
        return self._commit(
            "WRITE",
            params,
            add,
            remove,
            schema_json=df.schema.json(),
        )

    @_retry_conflicts
    def _replace_where(
        self,
        df: DataFrame,
        predicate: str,
        cluster_by: list[str] | None,
        num_files: int | None,
        txn_id: str | None,
    ) -> int:
        """Predicate-scoped overwrite (Delta's ``replaceWhere``): ONE
        commit that removes the predicate's rows and lands the new data.
        Only files containing matching rows rewrite (zone maps + the scan
        filter find them — O(selectivity), not O(table)); the incoming
        rows are staged first and validated against the predicate from
        the staged parquet (no recompute of the caller's pipeline, no
        double scan of the input)."""
        if not self.exists():
            return self.write(
                df, mode="overwrite", cluster_by=cluster_by,
                num_files=num_files, txn_id=txn_id,
            )
        current = {f.name: f.dataType.simpleString() for f in self._schema_at().fields}
        incoming = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        if incoming != current:
            raise ValueError(
                f"replace_where schema mismatch: table has "
                f"{sorted(current.items())}, dataframe has "
                f"{sorted(incoming.items())} (replaceWhere keeps the table "
                "schema; use mode='overwrite' without replace_where to evolve)"
            )
        if cluster_by:
            nf = num_files or int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
            df = df.repartitionByRange(nf, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        cond = F.expr(predicate)
        # DVs fold FIRST — before this op stages any files of its own:
        # materialize's nested @_retry_conflicts resets _op_files on
        # entry, so files staged earlier would leak unreferenced if a
        # later step failed (the delete()/update() ordering discipline)
        self.materialize_deletion_vectors()
        # stage the incoming rows, then validate from the staged files —
        # Delta raises when a row falls outside the replaced region
        add_new = self._write_files(df)
        if add_new:
            staged = self._read_files(add_new)
            n_bad = staged.filter(~F.coalesce(cond, F.lit(False))).count()
            if n_bad:
                raise ValueError(
                    f"replace_where: {n_bad} incoming row(s) do not satisfy "
                    f"the predicate {predicate!r}; writing them would "
                    "corrupt rows outside the replaced region"
                )
        live = self._live_files()
        touched = (
            sorted(
                {
                    self._rel(r["__file"])
                    for r in self._with_file(self._read_files(live))
                    .filter(cond)
                    .select("__file")
                    .distinct()
                    .collect()
                }
            )
            if live
            else []
        )
        add_kept: list[str] = []
        change_dir = None
        if touched:
            rows = self._read_files(touched)
            survivors = rows.filter(~F.coalesce(cond, F.lit(False)))
            if self.change_feed:
                change_dir = self._write_change_data(
                    rows.filter(cond)
                    .withColumn("_change_type", F.lit("delete"))
                    .unionByName(
                        self._read_files(add_new).withColumn(
                            "_change_type", F.lit("insert")
                        )
                    )
                    if add_new
                    else rows.filter(cond).withColumn(
                        "_change_type", F.lit("delete")
                    )
                )
            add_kept = self._write_files(survivors)
        elif self.change_feed and add_new:
            change_dir = self._write_change_data(
                self._read_files(add_new).withColumn(
                    "_change_type", F.lit("insert")
                )
            )
        params = {"mode": "Overwrite", "predicate": predicate}
        if txn_id is not None:
            params["txnId"] = str(txn_id)
        if change_dir:
            params["changeData"] = change_dir
        return self._commit(
            "WRITE", params, add_new + add_kept, touched,
            schema_json=self._schema_at().json(),
        )

    def last_txn_id(self, app: str | None = None) -> str | None:
        """The ``txn_id`` of the most recent commit that recorded one, or
        None — the read half of the write(txn_id=...) idempotence pattern.
        Scans commits newest-first and stops at the first token, so a
        non-transactional commit interleaved by another writer doesn't hide
        the sink's own progress marker.

        With ``app``, only tokens written as ``'<app>:<id>'`` count and the
        ``<id>`` part is returned — Delta's appId-scoped setTransaction
        contract, so two independent streams (or an unrelated txn writer)
        sharing one table cannot swallow each other's batch watermarks.

        App ids must not contain ``':'`` (the token separator): app
        ``'a'`` would otherwise prefix-match another stream's token
        ``'a:b:5'`` and return ``'b:5'``, which crashes ``int()`` in
        fold_cdc_batch / stream_into_vintage or corrupts the exactly-once
        watermark. Enforced here, at the composing call sites
        (stream_into_vintage / fold_cdc_batch reject ':' in app ids), and
        at the sink: ``_commit`` refuses any txn token with more than one
        colon, so an ambiguous token can never be written."""
        if app is not None and ":" in app:
            raise ValueError(
                f"app id {app!r} contains ':' (the txn-token separator); "
                "scoped watermarks would be ambiguous across streams"
            )
        prefix = None if app is None else f"{app}:"
        for c in reversed(self._commits()):
            tid = (c.operation_parameters or {}).get("txnId")
            if tid is None:
                continue
            if prefix is None:
                return tid
            if tid.startswith(prefix):
                return tid[len(prefix) :]
        return None

    @_retry_conflicts
    def merge(
        self,
        source: DataFrame,
        key_cols: list[str],
        schema_evolution: bool = False,
        on_duplicate_source: str = "error",
        order_col: str | None = None,
        txn_id: str | None = None,
        not_matched_by_source_delete: bool | str = False,
        matched_update: dict[str, str] | None = None,
        matched_condition: str | None = None,
        matched_delete: bool | str = False,
        insert_condition: str | None = None,
    ) -> int:
        """Upsert: whenMatched updateAll / whenNotMatched insertAll on key
        equality (README.md:125-130). With ``schema_evolution`` new source
        columns are added, like Delta's autoMerge (README.md:330).

        ``not_matched_by_source_delete`` is Delta's
        ``whenNotMatchedBySourceDelete``: target rows whose key does NOT
        appear in the source are deleted — everywhere (``True``) or only
        where a SQL condition holds (a condition string). ``merge(src, keys,
        not_matched_by_source_delete=True)`` is therefore a full table sync
        to the source within one commit. Rows where the condition evaluates
        NULL are kept (SQL delete semantics, same as ``delete()``).

        Duplicate source keys (``on_duplicate_source``): ``"error"`` (the
        default, Delta parity — Delta's MERGE raises when several source rows
        match one target row) validates in the same tiny agg job that feeds
        zone-map skipping; ``"keep_any"`` keeps an arbitrary row per key
        (explicitly opting into nondeterminism); ``"assume_unique"`` skips
        both — for callers that already deduplicated, e.g. the streaming
        sink's order_col tiebreak. Passing ``order_col`` keeps the row with
        the greatest value per key, deterministically.

        Copy-on-write: only files containing a matched key are rewritten;
        scanning for matches reads just the key columns (column pruning) +
        file metadata.

        **Conditional clauses** (Delta's full MERGE surface, subset):
        passing any of ``matched_update`` / ``matched_delete`` /
        ``insert_condition`` switches the matched/not-matched handling from
        updateAll/insertAll to clause semantics:

        - ``matched_delete`` (bool or SQL condition): matched target rows
          where the condition holds are DELETED. Evaluated first, like a
          leading ``whenMatchedDelete`` clause.
        - ``matched_update`` (col -> SQL expr) with optional
          ``matched_condition``: surviving matched rows where the condition
          holds get the listed columns reassigned; other columns keep their
          target values. Matched rows matching NO clause stay unchanged
          (Delta semantics — note the contrast with default updateAll).
        - ``insert_condition``: not-matched source rows are inserted only
          where it holds (evaluated on source columns, bare names).

        Conditions/update expressions see TARGET columns by bare name and
        SOURCE columns as ``src_<name>`` (e.g. ``"o_totalprice <
        src_o_totalprice"``). Clause mode composes with
        ``schema_evolution`` (Delta's autoMerge with conditional clauses:
        new source columns join the schema in the same commit; matched
        rows no clause updates keep typed nulls there) and with
        ``not_matched_by_source_delete``.
        """
        clause_mode = (
            matched_update is not None
            or bool(matched_delete)
            or insert_condition is not None
        )
        if matched_condition is not None and matched_update is None:
            raise ValueError("matched_condition requires matched_update")
        if order_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
            src = (
                source.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        elif on_duplicate_source == "keep_any":
            src = source.dropDuplicates(key_cols)
        elif on_duplicate_source in ("error", "assume_unique"):
            src = source
        else:
            raise ValueError(
                f"on_duplicate_source={on_duplicate_source!r}; expected "
                "'error', 'keep_any' or 'assume_unique'"
            )
        if self.change_feed:
            # pin the source to ONE evaluation: the change-data write and the
            # table-data write are separate jobs, and a nondeterministic
            # source (e.g. a keep_any dropDuplicates pick) could otherwise
            # record one row in the change feed while landing another in the
            # table — CDC consumers would reconstruct divergent state.
            # EAGER since round 13: the two writes now run concurrently
            # (_write_data_and_changes), so the checkpoint must be
            # materialized before either starts — a lazy checkpoint's
            # first materialization could race and evaluate src twice
            src = src.localCheckpoint(eager=True)
        # merge reasons about raw file contents (zone-map skip + rewrite),
        # so outstanding deletion vectors are folded in first
        self.materialize_deletion_vectors()
        live = self._live_files()
        key0 = key_cols[0]
        validate = on_duplicate_source == "error" and order_col is None
        rng = None
        if validate or (
            live
            and self._live_data_bytes(stop_at=_MERGE_PRUNE_MIN_BYTES, live=live)
            >= _MERGE_PRUNE_MIN_BYTES
        ):
            # One tiny agg job does double duty: the key range feeds
            # zone-map file skipping, the exact distinct count detects
            # duplicate source keys without a separate pass. When the
            # caller already vouches for unique keys (assume_unique /
            # order_col) the agg exists ONLY for pruning — and below the
            # size gate the table is too small for file skipping to beat
            # the job's fixed cost, so the whole job is skipped and the
            # touched-file scan simply reads every live file (identical
            # results: pruning is an over-approximation either way). At
            # 100 TB the gate keeps the agg, which is what makes merge
            # O(touched files) instead of O(table).
            aggs = [F.min(key0).alias("lo"), F.max(key0).alias("hi")]
            if validate:
                aggs += [
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct(F.struct(*key_cols)).alias("nd"),
                ]
            rng = src.agg(*aggs).head()
            if validate and rng["n"] != rng["nd"]:
                raise ValueError(
                    f"merge source has {rng['n'] - rng['nd']} duplicate "
                    f"key(s) on {key_cols} (Delta raises here too); pass "
                    "order_col= for a deterministic tiebreak or "
                    "on_duplicate_source='keep_any'"
                )
        if live:
            # Zone-map skip: files whose key range can't overlap the
            # source's never get read at all (Delta-style data skipping).
            candidates = live
            if rng and rng["lo"] is not None:
                lo, hi = rng["lo"], rng["hi"]
                if isinstance(lo, (int, float, str)):
                    candidates = self._prune_by_range(live, key0, lo, hi)
            if candidates:
                snap = self._with_file(self._read_files(candidates))
                # Which files contain rows whose key appears in the source?
                # Reads only key columns + file metadata; Catalyst/AQE picks
                # broadcast when the source is small.
                touched_uris = [
                    r["__file"]
                    for r in snap.select("__file", *key_cols)
                    .join(src.select(*key_cols), key_cols, "left_semi")
                    .select("__file")
                    .distinct()
                    .collect()
                ]
                touched = sorted({self._rel(u) for u in touched_uris})
            else:
                touched = []
        else:
            touched = []

        nmbs = not_matched_by_source_delete
        nmbs_cond = None
        if nmbs:
            nmbs_cond = F.expr(nmbs) if isinstance(nmbs, str) else F.lit(True)
        if nmbs and live:
            # whenNotMatchedBySource: any live file may hold deletable rows,
            # so this scan runs over ALL live files (key-range pruning is
            # only sound for the matched side). Catalyst prunes the read to
            # the key + condition columns; a selective condition string can
            # additionally be zone-map-pruned by callers via delete().
            snap_all = self._with_file(self._read_files(live))
            del_uris = [
                r["__file"]
                for r in snap_all.filter(nmbs_cond)
                .join(src.select(*key_cols), key_cols, "left_anti")
                .select("__file")
                .distinct()
                .collect()
            ]
            touched = sorted(set(touched) | {self._rel(u) for u in del_uris})

        target_schema = self._schema_at() if self.exists() else src.schema
        if self.exists() and not schema_evolution and not clause_mode:
            # Delta parity for star semantics (the default verb IS
            # updateAll + insertAll): without autoMerge, source columns
            # outside the target schema raise — the projections below
            # would otherwise silently discard them (the user believes
            # the column landed). Clause mode is exempt: there, extra
            # source columns are legitimate EXPRESSION inputs
            # (``matched_update={"v": "src_ratio * v"}``) and the clause
            # insert projects the target schema like Delta's explicit
            # INSERT (cols) form.
            extra = sorted(
                set(src.columns) - {f.name for f in target_schema.fields}
            )
            if extra:
                raise ValueError(
                    f"merge source has column(s) {extra} not in the target "
                    f"schema; pass schema_evolution=True to add them "
                    "(Delta raises here too)"
                )

        def _pad_to(frame: DataFrame, schema) -> DataFrame:
            """Project onto schema order, adding evolved columns an old file
            lacks as typed nulls."""
            have = set(frame.columns)
            for f in schema.fields:
                if f.name not in have:
                    frame = frame.withColumn(f.name, F.lit(None).cast(f.dataType))
            return frame.select(*[f.name for f in schema.fields])

        if clause_mode:
            # ---- Delta conditional-clause semantics (see docstring) ----
            # schema_evolution (autoMerge with clauses): the schema evolves
            # FIRST, inside this same commit — new source columns append to
            # the target schema, touched rows get typed-null padding there,
            # and only clause-updated rows can receive non-null values
            if schema_evolution:
                from pyspark.sql.types import StructField, StructType

                known = {f.name for f in target_schema.fields}
                # evolved columns are ALWAYS nullable: untouched/unmatched
                # rows read them as typed nulls, so carrying a non-null
                # source field's nullability would commit a schema the
                # existing data violates (stock Delta writers enforce
                # NOT NULL invariants on export) — same forced-True as
                # merge_delta_export's evolution path
                target_schema = StructType(
                    list(target_schema.fields)
                    + [
                        StructField(f.name, f.dataType, True, f.metadata)
                        for f in src.schema.fields
                        if f.name not in known
                    ]
                )
            tcols = [f.name for f in target_schema.fields]
            # Assignments to columns outside the (possibly just-evolved)
            # target schema would otherwise be silently dropped by the
            # tcols-ordered rewrite below — Delta raises an AnalysisException
            # here, so do the same rather than no-op a user's UPDATE SET
            if matched_update is not None:
                unknown = sorted(set(matched_update) - set(tcols))
                if unknown:
                    raise ValueError(
                        f"merge matched_update assigns to column(s) "
                        f"{unknown} not in the target schema {tcols}; "
                        "pass schema_evolution=True to add new columns, "
                        "or fix the assignment (Delta raises here too)"
                    )
            # inserts = source rows whose key exists NOWHERE in the target;
            # every matched key's rows live in touched files by construction.
            # Under evolution a source missing an old table column pads it
            # with nulls (autoMerge insertAll); otherwise the source must
            # supply every table column (select errors, like Delta). A
            # matched-only merge (insert_condition 'false' — the SQL
            # dispatcher's encoding for "no NOT MATCHED clause") never
            # inserts, so its source legitimately carries only the key +
            # clause-input columns (Delta allows this too): inserts are an
            # EMPTY frame, not a projection the source can't satisfy.
            never_inserts = (
                insert_condition is not None
                and insert_condition.strip().lower() == "false"
            )
            if never_inserts:
                ins_src = self.spark.createDataFrame([], target_schema)
            elif schema_evolution:
                ins_src = _pad_to(src, target_schema)
            else:
                ins_src = src.select(*tcols)
            src_extra = src.select(
                *key_cols,
                *[
                    F.col(c).alias(f"src_{c}")
                    for c in src.columns
                    if c not in key_cols
                ],
                F.lit(True).alias("__m"),
            )
            del_expr = (
                F.expr(matched_delete)
                if isinstance(matched_delete, str)
                else F.lit(bool(matched_delete))
            )
            upd_frames = None  # (before, after) for the change feed
            del_frame = None
            if touched:
                touched_rows = self._read_files(touched)
                tgt = _pad_to(touched_rows, target_schema)
                joined = tgt.join(src_extra, key_cols, "left")
                matched = F.coalesce(F.col("__m"), F.lit(False))
                # NULL conditions act as not-satisfied (SQL WHEN semantics)
                del_mask = matched & F.coalesce(
                    del_expr.cast("boolean"), F.lit(False)
                )
                upd_gate = (
                    F.coalesce(F.expr(matched_condition).cast("boolean"), F.lit(False))
                    if matched_condition is not None
                    else F.lit(True)
                )
                upd_mask = (
                    matched & ~del_mask & upd_gate
                    if matched_update is not None
                    else F.lit(False)
                )
                survivors = joined.filter(~del_mask)
                if nmbs_cond is not None:
                    survivors = survivors.filter(
                        ~(~matched & F.coalesce(nmbs_cond, F.lit(False)))
                    )
                assigned = {
                    c: F.when(upd_mask, F.expr(matched_update[c])).otherwise(F.col(c))
                    for c in (matched_update or {})
                }
                rewritten = survivors.select(
                    *[assigned.get(c, F.col(c)).alias(c) for c in tcols]
                )
                ins_src = ins_src.join(
                    touched_rows.select(*key_cols), key_cols, "left_anti"
                )
                if self.change_feed:
                    del_all = joined.filter(del_mask)
                    if nmbs_cond is not None:
                        del_all = del_all.unionByName(
                            joined.filter(~matched & F.coalesce(nmbs_cond, F.lit(False)))
                        )
                    del_frame = del_all.select(*tcols)
                    if matched_update is not None:
                        upd_rows = joined.filter(upd_mask)
                        upd_frames = (
                            upd_rows.select(*tcols),
                            upd_rows.select(
                                *[
                                    (F.expr(matched_update[c]) if c in matched_update else F.col(c)).alias(c)
                                    for c in tcols
                                ]
                            ),
                        )
            else:
                rewritten = None
            if insert_condition is not None:
                ins_src = ins_src.filter(
                    F.coalesce(F.expr(insert_condition).cast("boolean"), F.lit(False))
                )
            new_data = (
                rewritten.unionByName(ins_src) if rewritten is not None else ins_src
            )
            changes = None
            if self.change_feed:
                changes = ins_src.withColumn("_change_type", F.lit("insert"))
                if del_frame is not None:
                    changes = changes.unionByName(
                        del_frame.withColumn("_change_type", F.lit("delete"))
                    )
                if upd_frames is not None:
                    before, after = upd_frames
                    changes = changes.unionByName(
                        before.withColumn("_change_type", F.lit("delete"))
                    ).unionByName(after.withColumn("_change_type", F.lit("insert")))
            # concurrent data + CDC writes; src is an eager checkpoint, and
            # every other shared input is a deterministic file scan
            add, change_dir = self._write_data_and_changes(new_data, changes)
            params = {
                "predicate": " AND ".join(f"{k} = source.{k}" for k in key_cols),
                "clauses": "true",
            }
            if change_dir:
                params["changeData"] = change_dir
            if txn_id is not None:
                params["txnId"] = str(txn_id)
            if not self.exists():
                clause_schema_json = new_data.schema.json()
            elif schema_evolution and set(tcols) != {
                f.name for f in self._schema_at().fields
            }:
                # evolved schema recorded with THIS commit; time travel
                # below it replays the prior metaData, old schema intact
                clause_schema_json = target_schema.json()
            else:
                clause_schema_json = None
            return self._commit(
                "MERGE",
                params,
                add,
                touched,
                schema_json=clause_schema_json,
            )

        if touched:
            touched_rows = self._read_files(touched)
            kept = touched_rows.join(src.select(*key_cols), key_cols, "left_anti")
            if nmbs_cond is not None:
                # keep unmatched rows only where the delete condition is NOT
                # true; NULL-condition rows survive (coalesce), matching
                # SQL DELETE and Delta's whenNotMatchedBySourceDelete
                kept = kept.filter(F.coalesce(~nmbs_cond, F.lit(True)))
            if schema_evolution:
                new_data = src.unionByName(kept, allowMissingColumns=True)
            else:
                # project BOTH sides onto the table schema: src must supply
                # every table column (select errors otherwise, like Delta),
                # kept rows from pre-evolution files get typed-null padding
                new_data = src.select(*[f.name for f in target_schema.fields]).unionByName(
                    _pad_to(kept, target_schema)
                )
        elif schema_evolution:
            new_data = src
        else:
            new_data = src.select(*[f.name for f in target_schema.fields])

        if self.change_feed:
            # CDF capture: every source row lands (insert); previously-stored
            # rows for matched keys disappear (delete). Reuses the frames the
            # merge already computes — O(changed rows), executor-side.
            inserts = src if schema_evolution else src.select(
                *[f.name for f in target_schema.fields]
            )
            changes = inserts.withColumn("_change_type", F.lit("insert"))
            if touched:
                matched_old = touched_rows.join(src.select(*key_cols), key_cols, "left_semi")
                changes = changes.unionByName(
                    matched_old.withColumn("_change_type", F.lit("delete")),
                    allowMissingColumns=True,
                )
                if nmbs_cond is not None:
                    removed = touched_rows.join(
                        src.select(*key_cols), key_cols, "left_anti"
                    ).filter(nmbs_cond)
                    changes = changes.unionByName(
                        removed.withColumn("_change_type", F.lit("delete")),
                        allowMissingColumns=True,
                    )
        else:
            changes = None

        # Untouched files keep their old schema; mergeSchema on read surfaces
        # evolved columns as nulls there, matching Delta autoMerge semantics.
        # Data + CDC land as concurrent jobs (src is an eager checkpoint).
        add, change_dir = self._write_data_and_changes(new_data, changes)
        schema_json = None
        if not self.exists():
            schema_json = new_data.schema.json()
        elif schema_evolution:
            # record prior-schema ∪ new columns — new_data alone can miss
            # table columns when the merge touched no (or only old) files
            from pyspark.sql.types import StructType

            prior = self._schema_at()
            names = {f.name for f in prior.fields}
            merged = StructType(
                list(prior.fields)
                + [f for f in new_data.schema.fields if f.name not in names]
            )
            schema_json = merged.json()
        params = {"predicate": " AND ".join(f"{k} = source.{k}" for k in key_cols)}
        if nmbs:
            params["notMatchedBySourceDelete"] = (
                nmbs if isinstance(nmbs, str) else "true"
            )
        if change_dir:
            params["changeData"] = change_dir
        if txn_id is not None:
            # idempotence token for replay-prone sinks (see write(txn_id=))
            params["txnId"] = str(txn_id)
        return self._commit("MERGE", params, add, touched, schema_json=schema_json)

    @_retry_conflicts
    def delete(self, condition: str, mode: str = "copy_on_write") -> int:
        """Logical predicate delete (README.md:281).

        ``mode="copy_on_write"`` (default): rewrites only files that contain
        matching rows; a file left empty is simply removed.

        ``mode="dv"``: merge-on-read — records matched row positions as a
        deletion-vector sidecar (Delta's deletion vectors). O(matched rows)
        written, zero data files rewritten: the right shape for point/GDPR
        deletes on a 100 TB table where copy-on-write would rewrite a
        128 MB file per deleted row. Readers apply DVs automatically;
        compact() or materialize_deletion_vectors() folds them back in."""
        if mode == "dv":
            return self._delete_dv(condition)
        if mode != "copy_on_write":
            raise ValueError(f"mode={mode!r}; expected 'copy_on_write' or 'dv'")
        # the file-level rewrite below reasons about raw file contents, so
        # outstanding DVs must be folded in first (no-op commit-free when
        # none are live)
        self.materialize_deletion_vectors()
        live = self._live_files()
        cond = F.expr(condition)
        touched = (
            sorted(
                {
                    self._rel(r["__file"])
                    for r in self._with_file(self._read_files(live))
                    .filter(cond)
                    .select("__file")
                    .distinct()
                    .collect()
                }
            )
            if live
            else []
        )
        if not touched:
            return self._commit("DELETE", {"predicate": condition}, [], [])
        rows = self._read_files(touched)
        # keep rows where the predicate is FALSE **or NULL** — SQL DELETE
        # only removes rows where it is true; a bare ~cond would silently
        # drop NULL-evaluating rows from rewritten files
        survivors = rows.filter(~F.coalesce(cond, F.lit(False)))
        # zero-row outputs are dropped inside _write_files; no isEmpty job.
        # Survivor rewrite + CDC land as concurrent jobs: both sides are
        # deterministic scans of the same touched files (a nondeterministic
        # condition was already double-evaluated by the sequential form)
        add, change_dir = self._write_data_and_changes(
            survivors,
            rows.filter(cond).withColumn("_change_type", F.lit("delete"))
            if self.change_feed
            else None,
        )
        params = {"predicate": condition}
        if change_dir:
            params["changeData"] = change_dir
        return self._commit("DELETE", params, add, touched)

    def _update_dv(self, condition: str, assignments: dict) -> int:
        """Merge-on-read update: record the matched rows' positions as a
        deletion-vector sidecar and APPEND their updated copies — Delta's
        DV-backed UPDATE. O(matched rows) written, zero data files
        rewritten: the point-update shape for a 100 TB table where
        copy-on-write would rewrite a 128 MB file per touched row. Readers
        see the update immediately (DV anti-join hides the old rows, the
        appended file supplies the new ones)."""
        live = self._live_files()
        data, dvs = self._split_live(live)
        cond = F.expr(condition)
        if not data:
            return self._commit(
                "UPDATE", {"predicate": condition, "deletionVectors": "true"}, [], []
            )
        snap = self._with_dv_key(self._read_files(data))
        if dvs:
            prior = self.spark.read.parquet(
                *[os.path.join(self.path, f) for f in dvs]
            ).select("file", "pos")
            snap = snap.join(
                prior,
                (snap["__dv_file"] == prior["file"])
                & (snap["__dv_pos"] == prior["pos"]),
                "left_anti",
            )
        # pin the matched row set BEFORE any write: the DV sidecar and the
        # appended copies are separate jobs, and a non-deterministic
        # condition (rand(), current_timestamp()) re-evaluated per job
        # could hide one row set and append a different one — silent row
        # loss/duplication. localCheckpoint makes both jobs read the same
        # materialized rows.
        matched = snap.filter(cond).localCheckpoint(eager=False)
        add_dv = self._write_dv_files(
            matched.select(
                F.col("__dv_file").alias("file"), F.col("__dv_pos").alias("pos")
            )
        )
        before = matched.drop("__dv_file", "__dv_pos")
        # cast each assignment back to the column's existing type: the
        # copy-on-write path coerces via when().otherwise(col) (literal
        # 1.0 assigned to a double column stays double); the append path
        # must not let the expression's own type (decimal!) leak into the
        # table's files and fork the schema
        col_types = {f.name: f.dataType for f in before.schema.fields}
        after = before.withColumns(
            {
                col: (F.expr(val) if isinstance(val, str) else val).cast(
                    col_types[col]
                )
                if col in col_types
                else (F.expr(val) if isinstance(val, str) else val)
                for col, val in assignments.items()
            }
        )
        if self.change_feed:
            after = after.localCheckpoint(eager=False)
        add_data = self._write_files(after)
        change_dir = self._write_change_data(
            before.withColumn("_change_type", F.lit("delete")).unionByName(
                after.withColumn("_change_type", F.lit("insert"))
            )
            if self.change_feed
            else None
        )
        params = {"predicate": condition, "deletionVectors": "true"}
        if change_dir:
            params["changeData"] = change_dir
        return self._commit("UPDATE", params, add_dv + add_data, [])

    @_retry_conflicts
    def update(
        self,
        condition: str,
        assignments: dict[str, "F.Column | str"],
        mode: str = "copy_on_write",
    ) -> int:
        """Predicate update, e.g. series-level attribute fan-out
        (README.md:290).

        ``mode="copy_on_write"`` (default) rewrites only files containing
        matching rows; ``mode="dv"`` is merge-on-read (see
        :meth:`_update_dv`): a deletion-vector sidecar hides the old rows
        and the updated copies are appended — O(matched rows) written."""
        if mode == "dv":
            return self._update_dv(condition, assignments)
        if mode != "copy_on_write":
            raise ValueError(f"mode={mode!r}; expected 'copy_on_write' or 'dv'")
        self.materialize_deletion_vectors()  # see delete(): raw-file rewrite
        live = self._live_files()
        cond = F.expr(condition)
        touched = (
            sorted(
                {
                    self._rel(r["__file"])
                    for r in self._with_file(self._read_files(live))
                    .filter(cond)
                    .select("__file")
                    .distinct()
                    .collect()
                }
            )
            if live
            else []
        )
        if not touched:
            return self._commit("UPDATE", {"predicate": condition}, [], [])
        rows = self._read_files(touched)
        updated = rows.withColumns(
            {
                col: F.when(cond, F.expr(val) if isinstance(val, str) else val).otherwise(
                    F.col(col)
                )
                for col, val in assignments.items()
            }
        )
        changes = None
        if self.change_feed:
            matching = rows.filter(cond)
            after = matching.withColumns(
                {
                    col: F.expr(val) if isinstance(val, str) else val
                    for col, val in assignments.items()
                }
            )
            changes = matching.withColumn(
                "_change_type", F.lit("delete")
            ).unionByName(after.withColumn("_change_type", F.lit("insert")))
        # rewrite + CDC as concurrent jobs (both deterministic scans of the
        # touched files; see delete())
        add, change_dir = self._write_data_and_changes(updated, changes)
        params = {"predicate": condition}
        if change_dir:
            params["changeData"] = change_dir
        return self._commit("UPDATE", params, add, touched)

    # ---------------------------------------------------------- maintenance

    @_retry_conflicts
    def compact(
        self,
        num_files: int = 4,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Rewrite the current snapshot into ``num_files`` files without a
        logical data change (README.md:403-412: repartition(4) +
        dataChange=false).

        ``sort_by`` range-partitions + sorts by the given columns: each file
        then owns a disjoint range of the FIRST column, so zone maps prune
        point/range reads on it to single files — but a filter on any other
        column still touches every file.

        ``zorder_by`` (two or more columns) clusters on the Morton (Z-curve)
        interleaving of the columns' bucketed ranks — Delta's OPTIMIZE
        ZORDER. Each file then covers a small hyper-rectangle of the key
        space, so zone maps prune selective filters on EVERY listed column,
        at the cost of slightly looser per-column ranges than a dedicated
        1-D sort.

        Column buckets (10 bits each, NULL -> bucket 0, Delta's nulls-first):

        - numeric: ``width_bucket`` over the min/max from one tiny agg;
        - string, <= ``_Z_DICT_MAX`` distinct: dictionary rank — sorted
          distinct values (one small agg, driver holds only the dictionary)
          mapped to scaled indices, preserving lexicographic locality so
          string zone maps prune ranges AND points (the SDMX dimension-key
          case, e.g. CURRENCY);
        - string, higher cardinality: hash buckets — equal values still
          cluster (point-predicate pruning works) but range locality is
          given up rather than paying a global sort; Delta samples a range
          partitioner here, a fine future upgrade."""
        snap = self.read()
        if zorder_by:
            from sdlt_spark.store.zcurve import zorder_key

            z = zorder_key(snap, zorder_by, dict_max=self._Z_DICT_MAX)
            reorg = (
                snap.withColumn("__z", z)
                .repartitionByRange(num_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        elif sort_by:
            reorg = snap.repartitionByRange(num_files, *sort_by).sortWithinPartitions(*sort_by)
        else:
            reorg = snap.repartition(num_files)
        add = self._write_files(reorg)
        return self._commit(
            "WRITE", {"mode": "Overwrite", "dataChange": "false"}, add, self._live_files(),
            data_change=False,
        )

    @_retry_conflicts
    def optimize(self, target_file_bytes: int = 128 * 1024 * 1024) -> int | None:
        """Small-file bin-packing compaction (Delta's OPTIMIZE): rewrite
        ONLY files under half the target size into ~target-sized files,
        leaving well-sized files alone — the steady-state maintenance op
        for tables fed by streaming/micro-batch appends (the reference's
        >300-small-files problem, README.md:392, without compact()'s full
        rewrite). Logical content is unchanged: dataChange=false, CDC
        readers skip it, and time travel still sees the old layout.

        Returns the new version, or None when fewer than two small files
        exist (nothing to gain). Cost is O(small files), not O(table):
        a 100 TB table with a day of streaming dribble rewrites only the
        dribble. Outstanding deletion vectors are folded into the rewrite
        for covered files (read path applies them)."""
        # DVs covering the files being rewritten must fold in; covering
        # retained files must stay — materializing globally keeps both
        # invariants with one simple rule
        self.materialize_deletion_vectors()
        data, _ = self._split_live(self._live_files())
        sized = []
        for f in data:
            try:
                sized.append((f, os.path.getsize(os.path.join(self.path, f))))
            except OSError as exc:
                # a live file that can't be stat'ed means the table state is
                # inconsistent (vacuumed too aggressively / external delete);
                # surfacing it beats silently degrading to a maintenance no-op
                raise FileNotFoundError(
                    f"live file {f} is unreadable; table at {self.path} is "
                    "inconsistent (vacuumed beyond retention?)"
                ) from exc
        small = [(f, s) for f, s in sized if s < target_file_bytes // 2]
        if len(small) < 2:
            return None
        total = sum(s for _, s in small)
        n_out = max(1, (total + target_file_bytes - 1) // target_file_bytes)
        rows = self._read_files([f for f, _ in small])
        # coalesce, not repartition: merging small files is map-side
        # concatenation — a shuffle would move the same bytes twice
        add = self._write_files(rows.coalesce(int(n_out)))
        return self._commit(
            "OPTIMIZE",
            {
                "targetFileBytes": str(target_file_bytes),
                "filesCompacted": str(len(small)),
                "dataChange": "false",
            },
            add,
            [f for f, _ in small],
            data_change=False,
        )

    def diff(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Row-level changes between two versions (CDC-style read): rows in
        ``to_version`` not present in ``from_version`` tagged 'insert', rows
        gone from ``from_version`` tagged 'delete'; an update appears as a
        delete+insert pair.

        File-pruned: only files that differ between the two snapshots are
        read. Rows living in files common to both versions appear
        identically on both sides and would cancel in the exceptAll anyway
        — so skipping them is exact, and the diff cost is O(changed files),
        not O(table). A merge that rewrote 1% of a 100 TB table diffs ~1 TB."""
        data_before, dv_before = self._split_live(self._live_files(version=from_version))
        data_after, dv_after = self._split_live(self._live_files(version=to_version))
        live_before, live_after = set(data_before), set(data_after)
        read_before = live_before - live_after
        read_after = live_after - live_before
        # Deletion vectors that differ between the snapshots logically
        # change their covered data files without touching the file list,
        # so those covered files must enter BOTH read sets (each side then
        # applies its own DV state; identically-covered common files still
        # cancel). Cost stays O(changed): only the changed DV sidecars are
        # opened to find coverage.
        changed_dv = set(dv_before).symmetric_difference(dv_after)
        if changed_dv:
            cov_abs = set().union(*self._dv_coverage(sorted(changed_dv)).values())
            read_before |= {f for f in live_before if self._abs(f) in cov_abs}
            read_after |= {f for f in live_after if self._abs(f) in cov_abs}
        before = self._read_files(sorted(read_before), version=from_version)
        if read_before:
            before = self._apply_dvs(before, dv_before)
        after = self._read_files(sorted(read_after), version=to_version)
        if read_after:
            after = self._apply_dvs(after, dv_after)
        # Compare on the UNION of the two snapshot schemas, padding either
        # side's missing columns with typed nulls (CDC semantics, like
        # Delta's change feed): an update that only sets a newly-evolved
        # column still surfaces as a delete+insert pair (before has NULL),
        # and rows in files common to both versions still cancel — they pad
        # identically on both sides. Intersecting columns instead would
        # report evolution-only updates as no-ops.
        to_fields = self._schema_at(version=to_version).fields
        to_names = {f.name for f in to_fields}
        fields = list(to_fields) + [
            f for f in self._schema_at(version=from_version).fields
            if f.name not in to_names
        ]

        def _pad(frame: DataFrame) -> DataFrame:
            have = set(frame.columns)
            for f in fields:
                if f.name not in have:
                    frame = frame.withColumn(f.name, F.lit(None).cast(f.dataType))
            return frame.select(*[f.name for f in fields])

        before, after = _pad(before), _pad(after)
        # exceptAll keeps multiplicity: dropping one of two identical rows IS
        # a delete (plain subtract/set semantics would miss it)
        inserts = after.exceptAll(before).withColumn("_change_type", F.lit("insert"))
        deletes = before.exceptAll(after).withColumn("_change_type", F.lit("delete"))
        return inserts.unionByName(deletes)

    def table_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        skip_change_commits: bool = False,
    ) -> DataFrame:
        """Per-commit CDC rows for versions in [from_version, to_version] —
        Delta's ``table_changes``. Unlike :meth:`diff` (which compares two
        snapshots), this attributes every change to its commit via
        ``_commit_version``:

        - row-level ops (MERGE/DELETE/UPDATE) replay their **materialized**
          change rows from ``_change_data/`` (tables built with
          ``change_feed=True``); without materialized changes they raise —
          or are skipped with ``skip_change_commits``, Delta's option of the
          same name — because re-deriving them would need a row diff;
        - file-level ops (WRITE/RESTORE/CLONE) are exact from the commit's
          file actions alone: added files are inserts, removed files are
          deletes — no row comparison, O(changed files) reads;
        - dataChange=false commits (compaction) emit nothing.
        """
        hi = self.latest_version() if to_version is None else to_version
        schema = self._schema_at(version=hi)
        parts: list[DataFrame] = []
        # incremental log parse: only the requested range is replayed
        for c in self._commits(after=from_version - 1):
            if c.version > hi:
                break
            resolved = resolve_commit_changes(c, skip_change_commits, table=self)
            if resolved is None:
                continue
            kind, payload = resolved[0], resolved[1]
            if kind == "dir":
                df = self.spark.read.option("mergeSchema", "true").parquet(
                    os.path.join(self.path, payload)
                )
            else:
                dv_ctx = resolved[2]
                frames = []
                inserts = [f for f, tag in payload if tag == "insert"]
                deletes = [f for f, tag in payload if tag == "delete"]
                if inserts:
                    ins = self._read_files(inserts, version=c.version)
                    # e.g. a CLONE whose v0 carries translated DVs: the
                    # cloned rows minus what the DVs delete ARE the inserts
                    ins = self._apply_dvs(ins, dv_ctx["insert"])
                    frames.append(ins.withColumn("_change_type", F.lit("insert")))
                if deletes:
                    dels = self._read_files(deletes, version=max(c.version - 1, 0))
                    # DV sidecars retired along with their covered files
                    # (overwrite/restore of a DV-bearing table): the deleted
                    # rows are the files' rows as of version-1, i.e. minus
                    # the DV-deleted ones — reading them raw would re-emit
                    # rows a DV delete already emitted
                    dels = self._apply_dvs(dels, dv_ctx["delete"])
                    frames.append(dels.withColumn("_change_type", F.lit("delete")))
                df = frames[0]
                if len(frames) == 2:
                    df = df.unionByName(frames[1], allowMissingColumns=True)
            parts.append(df.withColumn("_commit_version", F.lit(c.version).cast("long")))
        base = None
        for p in parts:
            base = p if base is None else base.unionByName(p, allowMissingColumns=True)
        if base is None:
            base = self.spark.createDataFrame([], schema).withColumns(
                {
                    "_change_type": F.lit(None).cast("string"),
                    "_commit_version": F.lit(None).cast("long"),
                }
            )
        # stable output order: schema at `hi` (typed-null padding for rows
        # from pre-evolution commits), then the CDC bookkeeping columns
        for f in schema.fields:
            if f.name not in base.columns:
                base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
        return base.select(
            *[f.name for f in schema.fields], "_change_type", "_commit_version"
        )

    @_retry_conflicts
    def restore(self, version: int | None = None, timestamp: float | None = None) -> int:
        """Roll the table back to a previous state (README.md:321: use a
        version or timestamp "to replace the current state (rollback
        functionality)") — Delta's RESTORE. Metadata-only: the commit swaps
        the live file set for the old snapshot's, re-pointing at files that
        still exist on disk; no data is read or rewritten, so restoring a
        100 TB table is O(file-list) driver work. History is preserved (the
        restore is itself a new version), and restore-of-restore works."""
        target_files = self._live_files(version=version, timestamp=timestamp)
        if timestamp is not None and version is None:
            # resolve for the history record
            eligible = [c for c in self._commits() if c.timestamp <= timestamp]
            version = eligible[-1].version
        current = self._live_files()
        add = [f for f in target_files if f not in current]
        remove = [f for f in current if f not in target_files]
        missing = [f for f in add if not os.path.exists(os.path.join(self.path, f))]
        if missing:
            raise FileNotFoundError(
                f"cannot restore to version {version}: {len(missing)} file(s) "
                f"already vacuumed, e.g. {missing[0]}"
            )
        schema_json = self._schema_at(version=version).json()
        return self._commit(
            "RESTORE", {"version": str(version)}, add, remove, schema_json=schema_json
        )

    def _bootstrap_v0(
        self,
        rel_add: list[str],
        dv_rows: "DataFrame | None",
        stats: dict,
        operation: str,
        params: dict,
        schema_json: str,
        partitions: dict | None = None,
    ) -> None:
        """Create THIS (not-yet-existing) table's v0 commit from prepared
        state — the shared scaffolding of shallow :meth:`clone` and
        :func:`~sdlt_spark.store.delta_read.import_delta_to_vintage`:
        optional translated deletion-vector rows, carried-over zone-map
        stats, optional per-file constant-column values (a partitioned
        Delta import's log-carried partitionValues), one commit, and
        failure cleanup of the half-written sidecars (the only bytes a
        zero-copy bootstrap ever writes)."""
        if self.exists():
            raise FileExistsError(f"destination {self.path} already exists")
        os.makedirs(self._log_path(), exist_ok=True)
        try:
            dv_add = self._write_dv_files(dv_rows) if dv_rows is not None else []
            if stats:
                tmp = self._stats_path() + f".tmp-{uuid.uuid4().hex}"
                os.makedirs(os.path.dirname(tmp), exist_ok=True)
                with open(tmp, "w") as fh:
                    json.dump(stats, fh)
                os.rename(tmp, self._stats_path())
            if partitions:
                tmp = self._partitions_path() + f".tmp-{uuid.uuid4().hex}"
                os.makedirs(os.path.dirname(tmp), exist_ok=True)
                with open(tmp, "w") as fh:
                    json.dump(partitions, fh)
                os.rename(tmp, self._partitions_path())
            self._commit(
                operation, params, rel_add + dv_add, [], schema_json=schema_json
            )
        except BaseException:
            self._cleanup_op_files()
            raise

    def clone(self, dest_path: str) -> "VintageTable":
        """Delta-style SHALLOW CLONE: a new table whose v0 commit points at
        the source snapshot's data files — metadata-only, zero data copied,
        O(file-list) driver work however large the table. Mutations on the
        clone are copy-on-write into the clone's own directory; the source
        is never touched (and the clone's vacuum() never deletes shared
        files it doesn't own — see vacuum). Zone-map stats ride along, so
        file skipping works on the clone immediately.

        Caveat (same as Delta's shallow clone): the SOURCE table does not
        know its clones exist, so vacuuming or overwriting the source can
        delete files a live clone still references — after which the
        clone's reads fail. Deep-copy (write the clone's read() into a new
        table) before vacuuming the source if clones must outlive it.

        The source is truly never touched — not even a metadata commit:
        live deletion vectors are TRANSLATED into the clone's v0 (their
        table-relative data-file references rewritten to absolute source
        paths, which is exactly what the read path's ``_rel_path_col``
        yields for out-of-root files). The translation writes O(deleted
        rows) — the only bytes a shallow clone ever writes."""
        dest = VintageTable(self.spark, dest_path, commit_hook=self._publish)
        files = self._live_files()
        data, dvs = self._split_live(files)
        rel_add = [
            os.path.relpath(os.path.join(self.path, f), dest.path) for f in data
        ]
        dv_rows = None
        if dvs:
            src_dv = self.spark.read.parquet(
                *[os.path.join(self.path, f) for f in dvs]
            )
            # rewrite refs to canonical absolute source paths; already-
            # absolute refs (the source being itself a clone) pass through
            root = self.path.rstrip("/") + "/"
            abs_ref = F.when(
                F.col("file").startswith("/"), F.col("file")
            ).otherwise(F.concat(F.lit(root), F.col("file")))
            dv_rows = src_dv.select(abs_ref.alias("file"), "pos")
        src_stats = self._file_stats()
        stats = {r: src_stats[f] for f, r in zip(data, rel_add) if f in src_stats}
        src_parts = self._file_partitions()
        parts = {r: src_parts[f] for f, r in zip(data, rel_add) if f in src_parts}
        dest._bootstrap_v0(
            rel_add,
            dv_rows,
            stats,
            "CLONE",
            {"source": self.path, "sourceVersion": str(self.latest_version())},
            self._schema_at().json(),
            partitions=parts or None,
        )
        return dest

    def vacuum(self, retention_hours: float = 168.0) -> list[str]:
        """Physically delete files that are not live in the current snapshot
        and were removed longer than ``retention_hours`` ago (README.md:415).
        Time travel beyond the retention window stops working — same
        trade-off as Delta's VACUUM. Files outside the table root (shallow
        clone references) are never deleted — the clone doesn't own them,
        matching Delta's shallow-clone VACUUM behavior. The protection is
        one-directional: vacuuming a SOURCE table can still break shallow
        clones made FROM it, because the source has no record of them (see
        clone())."""
        commits = self._commits()
        current = set(self._live_files())
        cutoff = time.time() - retention_hours * 3600
        removed_at: dict[str, float] = {}
        for c in commits:
            for f in c.remove:
                removed_at[f] = c.timestamp
        deleted = []
        for f, ts in removed_at.items():
            if f.startswith(".."):  # shared (cloned-in) file — not owned
                continue
            if f not in current and ts <= cutoff:
                abs_f = os.path.join(self.path, f)
                if os.path.exists(abs_f):
                    os.remove(abs_f)
                    deleted.append(f)
        # Orphan sweep (Delta's VACUUM lists the directory too): data files
        # referenced by NO commit — left behind by a writer that crashed
        # between writing and committing — are deleted once older than the
        # retention window. The mtime guard is what keeps an in-flight
        # writer's files safe, exactly Delta's trade-off (its default
        # retention is 7 days for the same reason).
        # Change-data retention (Delta VACUUMs CDF files the same way): a
        # commit's materialized change rows are reclaimed once the commit
        # falls outside the retention window; table_changes / CDC streams
        # further back than retention stop working, like time travel.
        import shutil

        referenced_cd = set()
        for c in commits:
            cd = c.operation_parameters.get("changeData")
            if cd:
                referenced_cd.add(cd)
                if c.timestamp <= cutoff:
                    abs_cd = os.path.join(self.path, cd)
                    if os.path.isdir(abs_cd):
                        shutil.rmtree(abs_cd, ignore_errors=True)
                        deleted.append(cd)
        # change dirs referenced by NO commit: a writer crashed between the
        # CDC write and its commit — same orphan rule as data files
        change_root = os.path.join(self.path, _CHANGE_DIR)
        if os.path.isdir(change_root):
            for d in os.listdir(change_root):
                rel = f"{_CHANGE_DIR}/{d}"
                abs_d = os.path.join(change_root, d)
                try:
                    orphaned = rel not in referenced_cd and os.path.getmtime(abs_d) <= cutoff
                except OSError:
                    continue
                if orphaned:
                    shutil.rmtree(abs_d, ignore_errors=True)
                    deleted.append(rel)
        referenced = {f for c in commits for f in c.add}
        # deletion-vector sidecars follow the same rules as data files:
        # retired DVs are removed via removed_at above, crash-orphaned ones
        # by the same walk (dv/ shares the referenced/current/mtime guards)
        for root_dir in (_DATA_DIR, _DV_DIR):
            data_root = os.path.join(self.path, root_dir)
            self._sweep_orphans(data_root, referenced, current, cutoff, deleted)
        if deleted:
            # keep the zone-map file bounded: dead files need no stats
            stats = self._file_stats()
            for f in deleted:
                stats.pop(f, None)
            tmp = self._stats_path() + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                json.dump(stats, fh)
            os.rename(tmp, self._stats_path())
        return sorted(deleted)

    def _sweep_orphans(
        self,
        data_root: str,
        referenced: set[str],
        current: set[str],
        cutoff: float,
        deleted: list[str],
    ) -> None:
        for dirpath, _dirs, fnames in os.walk(data_root):
            for fname in fnames:
                abs_f = os.path.join(dirpath, fname)
                rel = os.path.relpath(abs_f, self.path)
                try:
                    # `rel not in current` is redundant while commit entries
                    # are never pruned (every live file has an add record),
                    # but guarantees the sweep can never touch a live file
                    orphaned = (
                        rel not in referenced
                        and rel not in current
                        and os.path.getmtime(abs_f) <= cutoff
                    )
                except OSError:
                    continue
                if orphaned:
                    try:
                        os.remove(abs_f)
                    except OSError:
                        continue
                    deleted.append(rel)
