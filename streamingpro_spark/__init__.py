"""streamingpro_spark — a PySpark-native engine with the query and
data-processing capabilities of allwefantasy/streamingpro (MLSQL).

The reference (surveyed in SURVEY.md) is a scripting language + runtime on
top of Spark: scripts are ``;``-separated statements (load / select / save /
set / connect / train / run / predict / register / include / !cmd), each
executed by an adaptor that calls public Spark APIs; all relational work is
delegated to Spark SQL (reference:
streamingpro-core/src/main/java/tech/mlsql/dsl/adaptor/SelectAdaptor.scala:70).

This package re-expresses that design idiomatically in PySpark: a tiny
statement parser (the grammar is 12 productions —
streamingpro-dsl/src/main/resources/DSLSQL.g4:15-31), a datasource
registry, an ET (Estimator/Transformer) operator registry, a built-in
function library, and Structured Streaming support. Catalyst + Tungsten
do the heavy lifting.
"""

from streamingpro_spark.engine import Engine
from streamingpro_spark.context import ExecutionContext

__all__ = ["Engine", "ExecutionContext"]
__version__ = "0.1.0"
