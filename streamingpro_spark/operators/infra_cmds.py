"""Infra command ETs: Delta/Kafka maintenance (dependency-gated),
stream-event callbacks, driver-side Python exec (SURVEY.md §2.4).

Delta Lake and Kafka client jars are optional deps of this engine; the
commands probe for them and raise a clear install hint when absent —
the statement surface (macros `!delta`, `!kafkaTool`, `!callback`,
`!python`) is always present.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from streamingpro_spark.operators.base import ETAlgorithm, get_int
from streamingpro_spark.operators.registry import register_et

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def _has_delta(spark) -> bool:
    try:
        # py4j returns a JavaPackage (no error) for missing classes;
        # Class.forName is the reliable probe
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


@register_et("DeltaCommandWrapper")
class DeltaCommandWrapper(ETAlgorithm):
    """!delta history/info/compact/show tables
    (reference: tech/mlsql/ets/DeltaCommandWrapper.scala:26-128).
    Requires the delta-spark package on the classpath."""

    def train(self, df, path, params, context=None):
        spark = df.sparkSession
        args = json.loads(params.get("parameters", "[]"))
        # versionedParquet lakes (the native time-travel fallback) serve
        # history/compact without delta-spark
        if len(args) > 1:
            from streamingpro_spark.sources import versioned as vp
            target = (context.resource_real_path(args[1])
                      if context else args[1])
            commits = vp.read_commits(target)
            if commits:
                if args[0] == "history":
                    return spark.createDataFrame(
                        [(c["version"], c["mode"], c["timestamp"])
                         for c in commits],
                        "version: long, mode: string, timestamp: long")
                if args[0] == "compact":
                    # rewrite the CURRENT snapshot as one fresh overwrite
                    # commit with n files (the OPTIMIZE equivalent)
                    n = int(args[2]) if len(args) > 2 else 1
                    snap = vp.load(context, args[1], {}).repartition(n)
                    vp.save(context, snap, args[1], "overwrite", {}, [])
                    return spark.createDataFrame(
                        [(target, len(commits), n)],
                        "path: string, compactedCommits: int, files: int")
        if not _has_delta(spark):
            raise NotImplementedError(
                "!delta requires Delta Lake (pip install delta-spark and "
                "spark.jars.packages=io.delta:delta-spark_2.13:<ver>); "
                "not present on this classpath — or point !delta at a "
                "versionedParquet lake for native history/compact")
        action = args[0] if args else "help"
        if action == "history":
            dt = spark._jvm.io.delta.tables.DeltaTable.forPath(spark._jsparkSession, args[1])
            from pyspark.sql import DataFrame as PDF
            return PDF(dt.history(), spark)
        if action == "compact":
            # read-coalesce-overwrite compaction (OPTIMIZE equivalent)
            target = args[1]
            n = int(args[2]) if len(args) > 2 else 1
            (spark.read.format("delta").load(target)
             .repartition(n).write.format("delta")
             .mode("overwrite").option("dataChange", "false").save(target))
            return spark.createDataFrame([(target, n)], "path: string, files: int")
        raise ValueError(f"!delta: unknown action {action!r}")


@register_et("KafkaCommand")
class KafkaCommand(ETAlgorithm):
    """!kafkaTool sampleData/streamOffset
    (reference: tech/mlsql/ets/KafkaCommand.scala).  Requires the
    spark-sql-kafka connector jar."""

    def train(self, df, path, params, context=None):
        spark = df.sparkSession
        args = json.loads(params.get("parameters", "[]"))
        try:
            probe = spark.read.format("kafka")
            opts = {k: v for k, v in params.items() if k.startswith("kafka.")}
            action = args[0] if args else "sampleData"
            topic = params.get("subscribe") or (args[1] if len(args) > 1 else None)
            if not topic:
                raise ValueError("!kafkaTool requires a topic (subscribe option)")
            reader = probe.option("subscribe", topic) \
                          .option("startingOffsets", params.get("startingOffsets", "earliest")) \
                          .option("endingOffsets", params.get("endingOffsets", "latest"))
            for k, v in opts.items():
                reader = reader.option(k, v)
            data = reader.load()
            if action == "sampleData":
                return data.limit(get_int(params, "sampleNum", 100)) \
                           .withColumn("value", F.col("value").cast("string")) \
                           .withColumn("key", F.col("key").cast("string"))
            return data.groupBy("topic", "partition").agg(
                F.min("offset").alias("minOffset"), F.max("offset").alias("maxOffset"))
        except Exception as e:
            if "Failed to find data source: kafka" in str(e) or "ClassNotFound" in str(e):
                raise NotImplementedError(
                    "!kafkaTool requires the spark-sql-kafka connector "
                    "(spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
                ) from e
            raise


@register_et("MLSQLEventCommand")
class MLSQLEventCommand(ETAlgorithm):
    """!callback post <url> when "started,progress,terminated" —
    register HTTP stream-event callbacks
    (reference: tech/mlsql/ets/MLSQLEventCommand.scala; dispatch
    MLSQLStreamManager.scala:92-120)."""

    def train(self, df, path, params, context=None):
        spark = df.sparkSession
        url = params.get("url", "")
        events = params.get("when", "started,progress,terminated")
        if not url:
            args = json.loads(params.get("parameters", "[]"))
            # !callback post <url> when <events>
            if len(args) >= 2 and args[0] == "post":
                url = args[1]
            if len(args) >= 4 and args[2] == "when":
                events = args[3].strip('"')
        if not url:
            raise ValueError("!callback requires: post <url> when \"<events>\"")
        from streamingpro_spark.streaming.manager import get_listener, http_callback
        listener = get_listener(spark)
        listener.add_callback(events, http_callback(url))
        return spark.createDataFrame([(url, events)], "url: string, events: string")


@register_et("PluginCommand")
class PluginCommand(ETAlgorithm):
    """`!plugin add <module-or-path>` — runtime ET plugins
    (reference: tech/mlsql/ets/PluginCommand.scala installs jar plugins
    into the running engine; the Python-native equivalent imports a
    module / exec's a .py file whose top level calls
    `streamingpro_spark.operators.registry.register_et`).

    Output: the ET names newly registered by the plugin.
    """

    def train(self, df, path, params, context=None):
        import importlib
        spark = df.sparkSession
        action = params.get("action", "add")
        name = params.get("name") or path
        from streamingpro_spark.operators import registry as _reg
        if action not in ("add", "load"):
            raise ValueError(f"!plugin: unsupported action {action!r} "
                             "(supported: add)")
        if not name:
            raise ValueError("!plugin add <module-or-path>")
        before = set(_reg._REGISTRY)
        if name.endswith(".py") or os.sep in name:
            scope: dict = {"__name__": f"sp_plugin_{os.path.basename(name)}"}
            with open(name, encoding="utf-8") as f:
                code = f.read()
            exec(compile(code, name, "exec"), scope)  # noqa: S102
        else:
            importlib.import_module(name)
        added = sorted(set(_reg._REGISTRY) - before)
        return spark.createDataFrame(
            [(name, ",".join(added))], "plugin: string, registered: string")


@register_et("PythonCommand")
class PythonCommand(ETAlgorithm):
    """!python — driver-side python exec over an input table
    (reference: tech/mlsql/ets/PythonCommand.scala, 405 LoC: per-session
    conda envs + executor dispatch; here: the in-process essential —
    code runs with `input_df` (pandas) bound, returns `output_df`).
    The reference's arg forms (PythonCommand.scala:171-223) are parsed:

        !python env "K=V";                 -- session env var
        !python conf "schema=st(...)";     -- session conf (recorded)
        !python '''<code>''';
        !python '''<code>''' named out;
        !python on tbl '''<code>''';
        !python on tbl '''<code>''' named out;

    start/close are accepted no-ops (no external worker processes — the
    engine IS python).  For executor-side python use PythonAlg /
    PythonScriptRun / ScriptUDF."""

    def train(self, df, path, params, context=None):
        spark = df.sparkSession
        code = params.get("code", "")
        source = params.get("input")
        named = None
        if not code and "parameters" in params:
            args = json.loads(params["parameters"])
            if args[:1] in (["start"], ["close"]):
                return spark.createDataFrame([(args[0], "ok")],
                                             "action: string, status: string")
            if len(args) == 2 and args[0] in ("env", "conf"):
                k, _, v = args[1].partition("=")
                if context is not None:
                    context.env[f"__python_{args[0]}_{k}__"] = v
                return spark.createDataFrame(
                    [(args[0], k, v)], "kind: string, k: string, v: string")
            if args and args[0] == "on":
                if len(args) < 3:
                    raise ValueError(
                        "!python on needs: on <table> '''<code>''' "
                        "[named <out>]")
                source = args[1]
                rest = args[2:]
                if len(rest) >= 3 and rest[-2] == "named":
                    code, named = " ".join(rest[:-2]), rest[-1]
                else:
                    code = " ".join(rest)
            elif len(args) >= 3 and args[-2] == "named":
                code, named = " ".join(args[:-2]), args[-1]
            else:
                # bare code (possibly tokenized by the macro arg split —
                # the pre-round-4 behavior joined everything into code)
                code = " ".join(args)
        target = spark.table(source) if source else df
        limit = get_int(params, "maxRows", 10000)
        scope: dict = {"input_df": target.limit(limit).toPandas()}
        try:
            exec(code, scope)  # noqa: S102 — explicit user-script execution ET
        except SyntaxError as e:
            raise ValueError(f"!python: syntax error in user code at line "
                             f"{e.lineno}: {e.msg}") from None
        out = scope.get("output_df")
        result = (spark.createDataFrame([("ok",)], "status: string")
                  if out is None else spark.createDataFrame(out))
        if named:
            if context is not None:
                context.register(result, named)
            else:
                result.createOrReplaceTempView(named)
        return result


@register_et("ModelCommand")
class ModelCommand(ETAlgorithm):
    """!model history <path> — list the saved versions of a model
    directory (reference: tech/mlsql/ets/ModelCommand.scala:37-70, which
    scans `_model_N` subdirs written by keepVersion and unions their
    meta; our ML wrappers store the version in the path itself)."""

    def train(self, df, path, params, context=None):
        action = params.get("action", "history")
        if action != "history":
            raise ValueError(f"!model: unknown action {action!r}; "
                             "supported: history")
        from streamingpro_spark.operators.ml_algs import _MLWrapper
        versions = _MLWrapper._list_versions(path)
        spark = df.sparkSession
        if versions:
            rows = [(os.path.join(path, f"_model_{v}"), v)
                    for v in sorted(versions, reverse=True)]
        elif os.path.exists(path):
            rows = [(path, 0)]
        else:
            raise ValueError(f"!model: {path} is not a model path")
        return spark.createDataFrame(rows, "modelPath: string, version: int")

    def explain_params(self):
        return [("action", "history", "history")]


@register_et("NothingET")
class NothingET(ETAlgorithm):
    """No-op ET (reference tech/mlsql/ets/NothingET — placeholder target
    used by internal command rewrites): returns an empty 1-column table."""

    def train(self, df, path, params, context=None):
        return df.sparkSession.createDataFrame([], "value: string")


# the standalone compaction command is the same gated delta surface
# (reference tech/mlsql/ets/DeltaCompactionCommand)
from streamingpro_spark.operators.registry import alias_et  # noqa: E402

alias_et("DeltaCompactionCommand", "DeltaCommandWrapper")
