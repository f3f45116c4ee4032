"""ScriptUDF: register user source code as a UDF/UDAF at runtime.

Reference: streaming/dsl/mmlib/algs/ScriptUDF.scala:33-101 compiles
Scala/Python/Java source held in a table or variable into a UDF
(`register ScriptUDF.`tbl` as fn options lang=... and dataType=...`).
Natively in Python this is just `exec` + `spark.udf.register` —
dramatically simpler (SURVEY.md §2.6); the Scala/Java lang variants are
dropped (documented).  UDAF → pandas_udf GROUPED_AGG.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamingpro_spark.operators.base import ETAlgorithm
from streamingpro_spark.operators.registry import register_et
from streamingpro_spark.sources.value_parser import parse_any_schema


def _resolve_return_type(type_str: str):
    from pyspark.sql import types as T
    s = type_str.strip()
    if not s:
        return T.StringType()
    if s.startswith("st("):
        return parse_any_schema(s)
    try:
        return T._parse_datatype_string(s)
    except Exception:
        return T.StringType()


@register_et("ScriptUDF")
class ScriptUDF(ETAlgorithm):
    """`register ScriptUDF.`scriptTable` as myFn options dataType="long"`.

    The source table/variable holds Python source defining a function
    named `methodName` (default: apply).  udfType="udaf" uses a
    pandas GROUPED_AGG aggregate over a single column.
    """

    def load(self, spark, path, params, context=None):
        # source: a 1-row table (name, content) from `load script.`var``
        # or a variable in env
        code = None
        if context is not None and path in context.env:
            code = context.env[path]
        else:
            try:
                rows = spark.table(path).collect()
                if rows and "content" in rows[0].__fields__:
                    code = rows[0]["content"]
                elif rows:
                    code = rows[0][0]
            except Exception:
                pass
        if code is None:
            raise ValueError(f"ScriptUDF: no source found at {path!r}")
        return {"code": code}

    def predict(self, spark, model, name, params):
        code = model["code"]
        method = params.get("methodName", "apply")
        ns: dict = {}
        try:
            exec(code, ns)  # noqa: S102 — deliberate: ScriptUDF is user code
        except SyntaxError as e:
            raise ValueError(
                f"ScriptUDF: python syntax error in user code at line "
                f"{e.lineno}: {e.msg}") from None
        if method not in ns:
            raise ValueError(f"ScriptUDF: function {method!r} not defined")
        fn = ns[method]
        rtype = _resolve_return_type(params.get("dataType", ""))
        if params.get("udfType") == "udaf":
            import pandas as pd  # noqa: F401
            pudf = F.pandas_udf(fn, rtype)
            spark.udf.register(name, pudf)
            return pudf
        return spark.udf.register(name, fn, rtype)

    def train(self, df, path, params, context=None):
        # `run ... as ScriptUDF` is not meaningful; registering happens via
        # the register statement.  Return input unchanged.
        return df

    def explain_params(self):
        return [("dataType", "return type (DDL or st(...) DSL)", "string"),
                ("methodName", "function name inside the source", "apply"),
                ("udfType", "udf|udaf", "udf"),
                ("lang", "only 'python' supported (scala/java dropped)", "python")]


@register_et("PythonScriptRun")
class PythonScriptRun(ETAlgorithm):
    """Run user Python over a table via Arrow batches — the PySpark-native
    answer to the reference's Ray/PythonAlg external-process path
    (tech/mlsql/ets/Ray.scala:52-330 ships tables over Arrow sockets; we
    are already in Python, so `mapInPandas` does this in-process).

    `run t as PythonScriptRun.`` where code='''def transform(pdf): ...'''
    and schema="st(field(a,long))"`  — `transform(pdf)` maps each Arrow
    batch (pandas DataFrame) to an output DataFrame.
    """

    def train(self, df, path, params, context=None):
        code = params.get("code", "")
        schema = parse_any_schema(params["schema"]) if params.get("schema") else df.schema
        ns: dict = {}
        try:
            exec(code, ns)  # noqa: S102
        except SyntaxError as e:
            raise ValueError(
                f"python syntax error in user code at line "
                f"{e.lineno}: {e.msg}") from None
        fn = ns.get("transform")
        if fn is None:
            raise ValueError("PythonScriptRun: define `def transform(pdf)` in code")

        def run(batches):
            for pdf in batches:
                out = fn(pdf)
                if out is not None and len(out):
                    yield out

        return df.mapInPandas(run, schema)

    def explain_params(self):
        return [("code", "python source defining transform(pdf)", ""),
                ("schema", "output schema (DDL or st(...))", "input schema")]
