"""Pre-execution analyzer: statement list → MLSQLTable-style access list.

Reference: pass D of ScriptSQLExec.parse (auth, :122-142) builds
`MLSQLTable(db, table, operateType, sourceType, tableType)` rows per
statement and hands them to a pluggable TableAuth
(streaming/dsl/auth/Protocal.scala:67-111 — OperateType
load/save/select/insert/...; TableType hive/hdfs/jdbc/kafka/temp/...).

Implementation: the statement forms (load/save/train/...) carry their
tables explicitly; for raw SELECT text the tables are extracted with
Spark's OWN parser (sessionState.sqlParser.parsePlan — the same
mechanism as the reference's grammar-validate pass), falling back to a
FROM/JOIN scan when no session is supplied.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

from streamingpro_spark import parser as P

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

_FILE_TYPES = {"csv", "json", "parquet", "orc", "text", "xml", "libsvm",
               "image", "binaryFile", "streamParquet"}


@dataclass
class TableRef:
    """MLSQLTable equivalent (Protocal.scala:67-80)."""
    table: str
    operate_type: str            # load | save | select | train | insert | ...
    source_type: str = ""        # parquet | jdbc | hive | temp | ...
    db: str | None = None

    def as_dict(self) -> dict:
        return {"table": self.table, "operateType": self.operate_type,
                "sourceType": self.source_type, "db": self.db}


@dataclass
class AnalyzeResult:
    inputs: list[TableRef] = field(default_factory=list)
    outputs: list[TableRef] = field(default_factory=list)

    def as_dict(self) -> dict:
        return {"inputs": [t.as_dict() for t in self.inputs],
                "outputs": [t.as_dict() for t in self.outputs]}


_FROM_JOIN_RE = re.compile(
    r"\b(?:from|join)\s+([A-Za-z_][\w]*(?:\.[\w]+)?)", re.IGNORECASE)


def _tables_in_sql(sql: str, spark: "SparkSession | None") -> list[str]:
    if spark is not None:
        try:
            jplan = (spark._jsparkSession.sessionState().sqlParser()
                     .parsePlan(sql))
            tree = jplan.treeString()
            # UnresolvedRelation leaves render as 'UnresolvedRelation [name];
            # CTE aliases ('CTE [t, u]' header) are not real inputs
            ctes = {n.strip() for m in re.findall(r"^CTE \[([^\]]+)\]", tree,
                                                  re.MULTILINE)
                    for n in m.split(",")}
            names = re.findall(r"'UnresolvedRelation \[([^\]]+)\]", tree)
            if names:
                # multipart names render as [db, tbl] — keep ALL parts
                # (split[0] reported `db.tbl` to the auth pass as `db`)
                full = {".".join(p.strip() for p in n.split(","))
                        for n in names}
                return sorted({n for n in full if n not in ctes})
        except Exception:
            pass
    return sorted({m.group(1) for m in _FROM_JOIN_RE.finditer(sql)
                   if m.group(1).lower() not in ("select",)})


def analyze(script: str, spark: "SparkSession | None" = None,
            env: dict[str, str] | None = None) -> AnalyzeResult:
    """Analyze without executing (REST `executeMode=analyze`)."""
    result = AnalyzeResult()
    env = dict(env or {})
    for raw in P.split_statements(script):
        text = P.template_merge(raw, env)
        try:
            stmt = P.parse_statement(text)
        except Exception:
            continue
        kind = type(stmt).__name__
        if kind == "CommandStmt":
            # macros read real tables (`!split docs ...` → run docs as
            # RateSampler) — expand so the auth pass sees them
            from streamingpro_spark.macros import MACROS, expand_macro
            if stmt.command not in MACROS:
                continue
            try:
                stmt = P.parse_statement(expand_macro(stmt))
            except Exception:
                continue
            kind = type(stmt).__name__
        if kind == "SetStmt":
            val = stmt.value if isinstance(stmt.value, str) else ""
            # execution OVERWRITES on re-assignment (only defaultParam
            # keeps the first value) — the analyzer must resolve ${var}
            # the same way or auth checks the wrong path
            if stmt.options.get("type", "") == "defaultParam":
                env.setdefault(stmt.key, val)
            else:
                env[stmt.key] = val
        elif kind == "LoadStmt":
            src = ("file" if stmt.format in _FILE_TYPES else stmt.format)
            result.inputs.append(TableRef(stmt.path, "load", src))
            result.outputs.append(TableRef(stmt.table, "load", "temp"))
        elif kind == "SelectStmt":
            for t in _tables_in_sql(stmt.sql, spark):
                result.inputs.append(TableRef(t, "select", "temp"))
            result.outputs.append(TableRef(stmt.table, "select", "temp"))
        elif kind == "SaveStmt":
            result.inputs.append(TableRef(stmt.table, "save", "temp"))
            result.outputs.append(TableRef(stmt.path, "save",
                                           "file" if stmt.format in _FILE_TYPES
                                           else stmt.format))
        elif kind == "RegisterStmt":
            # `register Alg.`path` as fn` READS the model path (or the
            # ScriptUDF source table) — the auth pass must see it
            result.inputs.append(TableRef(stmt.path, "register", "model"))
        elif kind == "TrainStmt":
            result.inputs.append(TableRef(stmt.table, stmt.verb, "temp"))
            if stmt.out_table:
                result.outputs.append(TableRef(stmt.out_table, stmt.verb, "temp"))
        elif kind == "RawSqlStmt":
            op = text.strip().split(None, 1)[0].lower()
            for t in _tables_in_sql(text, spark):
                result.inputs.append(TableRef(t, op, "hive"))
    return result
