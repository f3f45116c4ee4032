"""Kafka-style value decode + the compact ``st(field(...))`` schema DSL.

Reference: LoadAdaptor.scala:167-199 (valueFormat="json"|"csv" +
valueSchema="st(field(a,string),...)" parses the binary `value` column
into typed columns, keeping the metadata struct as `kafkaValue`);
parsers streaming/source/parser/impl/{Json,Csv}SourceParser.scala;
schema DSL also used by the Ray ET (tech/mlsql/ets/Ray.scala:199-209).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F, types as T

_SIMPLE = {
    "string": T.StringType(), "str": T.StringType(),
    "integer": T.IntegerType(), "int": T.IntegerType(),
    "long": T.LongType(), "bigint": T.LongType(),
    "double": T.DoubleType(), "float": T.FloatType(),
    "boolean": T.BooleanType(), "date": T.DateType(),
    "timestamp": T.TimestampType(), "binary": T.BinaryType(),
    "byte": T.ByteType(), "short": T.ShortType(), "decimal": T.DecimalType(38, 18),
}


def _tokenize_schema(s: str) -> list[str]:
    return [t for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*|[(),]", s)]


def parse_schema_dsl(text: str) -> T.StructType:
    """Parse ``st(field(a,integer),field(b,array(string)))`` into a
    StructType.  Supports st/field/array/map/simple types (the surface
    the reference tests exercise)."""
    toks = _tokenize_schema(text)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def eat(expected: str | None = None) -> str:
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(
                f"schema DSL: unexpected end of spec {text!r}"
                + (f" (expected {expected!r})" if expected else ""))
        tok = toks[pos]
        if expected is not None and tok != expected:
            raise ValueError(f"schema DSL: expected {expected!r}, got {tok!r}")
        pos += 1
        return tok

    def parse_type() -> T.DataType:
        tok = eat()
        low = tok.lower()
        if low == "st":
            eat("(")
            fields = []
            while peek() != ")":
                if peek() == ",":
                    eat(",")
                    continue
                fields.append(parse_field())
            eat(")")
            return T.StructType(fields)
        if low == "array":
            eat("(")
            elem = parse_type()
            eat(")")
            return T.ArrayType(elem)
        if low == "map":
            eat("(")
            k = parse_type()
            eat(",")
            v = parse_type()
            eat(")")
            return T.MapType(k, v)
        if low in _SIMPLE:
            return _SIMPLE[low]
        raise ValueError(f"schema DSL: unknown type {tok!r}")

    def parse_field() -> T.StructField:
        eat("field")
        eat("(")
        name = eat()
        eat(",")
        dtype = parse_type()
        eat(")")
        return T.StructField(name, dtype, True)

    t = parse_type()
    if not isinstance(t, T.StructType):
        raise ValueError("schema DSL must start with st(...)")
    return t


def parse_any_schema(text: str) -> T.StructType:
    """Accept st(...) DSL, JSON (DataType.fromJson), or DDL
    (StructType.fromDDL) — the three forms the reference accepts."""
    text = text.strip()
    if text.startswith("st(") or text.startswith("st ("):
        return parse_schema_dsl(text)
    if text.startswith("{"):
        return T.StructType.fromJson(__import__("json").loads(text))
    return T.StructType.fromDDL(text)


def decode_value(df: DataFrame, value_format: str, value_schema: str) -> DataFrame:
    """Parse the `value` column per valueFormat/valueSchema, keeping the
    original row as a `kafkaValue` metadata struct."""
    schema = parse_any_schema(value_schema)
    meta_cols = [c for c in df.columns if c != "value"]
    with_meta = df.withColumn("kafkaValue", F.struct(*meta_cols)) if meta_cols else df
    value_str = F.col("value").cast("string")
    if value_format == "json":
        parsed = with_meta.withColumn("__parsed", F.from_json(value_str, schema))
    elif value_format == "csv":
        parsed = with_meta.withColumn("__parsed", F.from_csv(value_str, schema.simpleString()))
    else:
        raise ValueError(f"unsupported valueFormat: {value_format}")
    cols = [F.col(f"__parsed.{f.name}").alias(f.name) for f in schema.fields]
    if meta_cols:
        cols.append(F.col("kafkaValue"))
    return parsed.select(*cols)
