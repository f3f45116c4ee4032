"""Execution context: env vars, last table, connections, branch state.

Reference: ``ScriptSQLExecListener`` holds ``_env`` (script variables),
``lastSelectTable``, and branch context
(streaming/dsl/ScriptSQLExec.scala:163-252); ``ConnectMeta`` stores
connection options under (format, alias)
(ScriptSQLExec.scala:420-445).  Multi-tenant path prefixing:
ScriptSQLExec.scala:271-291 (pathPrefix(owner)),
tech/mlsql/dsl/adaptor/DslAdaptor.scala:69-116 (withPathPrefix).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


@dataclass
class BranchFrame:
    """One !if/!elif/!else/!fi level."""
    taken: bool        # some branch at this level already ran
    active: bool       # current branch is executing
    parent_active: bool


@dataclass
class ExecutionContext:
    spark: "SparkSession"
    owner: str = "admin"
    home: str | None = None          # per-owner path prefix root (None = off)
    env: dict[str, str] = field(default_factory=dict)
    connect_meta: dict[tuple[str, str], dict[str, str]] = field(default_factory=dict)
    last_table: str | None = None
    branch_stack: list[BranchFrame] = field(default_factory=list)
    stream_name: str | None = None   # set streamName=... flips to stream mode
    cached_tables: dict[str, "DataFrame"] = field(default_factory=dict)
    udfs: dict[str, Any] = field(default_factory=dict)
    jobs: dict[str, Any] = field(default_factory=dict)
    extra: dict[str, Any] = field(default_factory=dict)
    #: reliable-checkpoint files written by eager_materialize — freed by
    #: Engine.close() (Spark only auto-cleans them when
    #: spark.cleaner.referenceTracking.cleanCheckpoints was set at build)
    checkpoint_files: list[str] = field(default_factory=list)
    #: load rewrite chain — fn(ctx, fmt, path, df) -> df, applied to every
    #: loaded table (reference LoadAdaptor.scala:132-136 row-filter /
    #: column-mask plugin hooks)
    load_hooks: list[Any] = field(default_factory=list)
    #: result render chain — fn(ctx, df) -> df, applied to the script's
    #: final table (reference RestController.scala ResultRenderManager)
    render_hooks: list[Any] = field(default_factory=list)
    #: per-THREAD state for the execute() nesting counter and the
    #: versionedParquet double-save write-set: an unsynchronized
    #: read-modify-write on a shared counter could make a replayed
    #: batch see depth > 0, skip the write-set clear, and hit the
    #: double-write error instead of the replay-skip path (round-10
    #: advisor finding).  SCOPE: this protects exactly that guard
    #: state.  Full concurrent execute() on ONE context is still not a
    #: supported pattern — last_table / stream_name / branch_stack are
    #: deliberately per-execute context fields, and the REST server
    #: isolates concurrent requests with a per-request Engine
    #: (server.py SessionManager) rather than per-thread script state.
    tls: Any = field(default_factory=threading.local, repr=False)

    # ---- path semantics (SURVEY.md §1) ----
    def resource_real_path(self, path: str) -> str:
        """Prefix relative paths with the per-owner home directory
        (reference: DslAdaptor.withPathPrefix)."""
        if not path:
            return path
        if self.home is None or os.path.isabs(path) or "://" in path:
            return path
        base = os.path.normpath(os.path.join(self.home, self.owner))
        real = os.path.normpath(os.path.join(base, path))
        # containment: '..' segments must not escape the per-owner
        # sandbox (server.py's _safe_path does this for uploads; loads/
        # saves/train paths need the same check)
        if real != base and not real.startswith(base + os.sep):
            raise PermissionError(
                f"path {path!r} escapes the per-owner directory")
        return real

    # ---- branch state ----
    def branch_active(self) -> bool:
        return all(f.active for f in self.branch_stack) if self.branch_stack else True

    # ---- table helpers ----
    def set_last_table(self, name: str) -> None:
        self.last_table = name

    def table(self, name: str) -> "DataFrame":
        return self.spark.table(name)

    def register(self, df: "DataFrame", name: str) -> None:
        df.createOrReplaceTempView(name)
        self.set_last_table(name)

    def is_stream(self) -> bool:
        return self.stream_name is not None
