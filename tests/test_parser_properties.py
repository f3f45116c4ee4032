"""Property tests: the parser is TOTAL on arbitrary input — any script
either parses or raises ValueError (never crashes another way), and
statement splitting respects quotes/blocks (REST receives arbitrary
user scripts; a parser crash would 500 the server with a stack trace
instead of a rendered error)."""

from hypothesis import given, settings, strategies as st

from streamingpro_spark import parser as P

_CHARS = st.text(
    alphabet="abc XY01;'\"`\n\t-!${}().,=<>*/", max_size=80)


@settings(max_examples=300, deadline=None)
@given(_CHARS)
def test_split_statements_total(s):
    try:
        parts = P.split_statements(s)
    except ValueError:
        return
    # re-joining loses only separators/whitespace, never statement text
    for p in parts:
        assert p.strip()


@settings(max_examples=300, deadline=None)
@given(_CHARS)
def test_parse_statement_total(s):
    if not s.strip():
        return
    try:
        P.parse_statement(s)
    except ValueError:
        pass  # the one allowed failure mode


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from([
    'select 1 as a as t1',
    'set x = "1;2"',
    "set y = '''a; b; c'''",
    'load parquet.`/tmp/x` as t2',
    '-- comment; with semicolon',
    '!desc t1',
]), min_size=1, max_size=6))
def test_split_roundtrip_preserves_statement_count(stmts):
    script = ";\n".join(stmts) + ";"
    parts = P.split_statements(script)
    non_comment = [s for s in stmts if not s.startswith("--")]
    assert len(parts) == len(non_comment)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ab:xy 01+-*/()<>=!&|'\".,len", max_size=60))
def test_condition_evaluation_total(cond):
    """!if conditions from users: evaluate or ValueError, never crash."""
    from streamingpro_spark.context import ExecutionContext
    from streamingpro_spark.expr import evaluate_condition
    ctx = ExecutionContext(spark=None, env={"x": "1", "y": "abc"})
    try:
        result = evaluate_condition(cond, ctx)
        assert isinstance(result, bool)
    except ValueError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="stfieldarymp(),<> abc_01", max_size=60))
def test_schema_dsl_total(spec):
    """st(...) schema specs from load options / kafka decode."""
    from streamingpro_spark.sources.value_parser import parse_schema_dsl
    try:
        parse_schema_dsl(spec)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(sorted({
    "cache", "desc", "println", "kill", "fs", "plugin", "show",
    "tableRepartition", "withWatermark", "jdbc",
    # round 6: templates with {N:default} placeholder forms
    "split", "runScript", "python", "model", "resource"})),
    st.lists(st.text(alphabet="abc01;`'\"$ {}named", max_size=12),
             max_size=8))
def test_macro_expansion_total(name, args):
    """!cmd argument lists from users: expand or ValueError."""
    from streamingpro_spark import parser as P
    from streamingpro_spark.macros import expand_macro
    cmd = P.CommandStmt(command=name, args=args)
    try:
        out = expand_macro(cmd)
        assert isinstance(out, str)
    except (ValueError, IndexError, KeyError) as e:
        assert isinstance(e, ValueError), f"leaked {type(e).__name__}: {e}"
