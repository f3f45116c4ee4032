"""Builtin UDF library tests (reference: UDFSuite.scala patterns)."""

import pytest


def test_mk_string(engine):
    df = engine.execute("""select mkString(",", array("a","b","c")) as v as out;""")
    assert df.collect()[0]["v"] == "a,b,c"


def test_vec_dense_and_array(engine):
    df = engine.execute("""
    select vec_array(vec_dense(array(1.0, 2.0, 3.0))) as v as out;
    """)
    assert df.collect()[0]["v"] == [1.0, 2.0, 3.0]


def test_vec_argmax(engine):
    df = engine.execute("select vec_argmax(vec_dense(array(1.0, 5.0, 3.0))) as v as out;")
    assert df.collect()[0]["v"] == 1


def test_vec_cosine(engine):
    df = engine.execute("""
    select vec_cosine(vec_dense(array(1.0, 0.0)), vec_dense(array(1.0, 0.0))) as same,
           vec_cosine(vec_dense(array(1.0, 0.0)), vec_dense(array(0.0, 1.0))) as orth
    as out;
    """)
    r = df.collect()[0]
    assert abs(r["same"] - 1.0) < 1e-9
    assert abs(r["orth"]) < 1e-9


def test_vec_wise_ops(engine):
    df = engine.execute("""
    select vec_array(vec_wise_add(vec_dense(array(1.0,2.0)), vec_dense(array(3.0,4.0)))) as a,
           vec_array(vec_wise_mul(vec_dense(array(2.0,3.0)), vec_dense(array(4.0,5.0)))) as m
    as out;
    """)
    r = df.collect()[0]
    assert r["a"] == [4.0, 6.0]
    assert r["m"] == [8.0, 15.0]


def test_onehot(engine):
    df = engine.execute("select vec_array(onehot(2, 4)) as v as out;")
    assert df.collect()[0]["v"] == [0.0, 0.0, 1.0, 0.0]


def test_ngram(engine):
    df = engine.execute("""select ngram(array("a","b","c","d"), 2) as v as out;""")
    assert df.collect()[0]["v"] == ["a b", "b c", "c d"]


def test_array_onehot(engine):
    df = engine.execute("select array_onehot(array(0, 2), 4) as v as out;")
    assert df.collect()[0]["v"] == [1.0, 0.0, 1.0, 0.0]


def test_padding_int_array(engine):
    df = engine.execute("select padding_int_array(array(1, 2), 0, 4) as v as out;")
    assert df.collect()[0]["v"] == [1, 2, 0, 0]


def test_parse_date_roundtrip(engine):
    df = engine.execute("""
    select parseLongAsDate(parseDateAsLong("2024-03-01 10:00:00", "yyyy-MM-dd HH:mm:ss"),
                           "yyyy-MM-dd HH:mm:ss") as v as out;
    """)
    assert df.collect()[0]["v"] == "2024-03-01 10:00:00"


def test_time_plus_minus(engine):
    df = engine.execute("""
    select timePlus(1000, "1 day") as p, timeMinus(100000, "1 hour") as m as out;
    """)
    r = df.collect()[0]
    assert r["p"] == 1000 + 86400
    assert r["m"] == 100000 - 3600


def test_byte_string(engine):
    df = engine.execute("""
    select byteStringAsBytes("2kb") as b, byteStringAsMb("3g") as m as out;
    """)
    r = df.collect()[0]
    assert r["b"] == 2048
    assert r["m"] == 3 * 1024


def test_uuid(engine):
    df = engine.execute("select uuid() as v as out;")
    assert len(df.collect()[0]["v"]) == 32


def test_crawler_md5(engine):
    df = engine.execute("""select crawler_md5("abc") as v as out;""")
    assert df.collect()[0]["v"] == "900150983cd24fb0d6963f7d28e17f72"


def test_crawler_extract_title(engine):
    df = engine.execute(
        '''select crawler_auto_extract_title("<html><title>Hi</title></html>") as v as out;''')
    assert df.collect()[0]["v"] == "Hi"


def test_crawler_extract_xpath(engine):
    html = ("<html><body><div class='a'><p>first</p><p>second</p></div>"
            "<div id='x'><span>target</span></div></body></html>")
    cases = [
        ("//span/text()", "target"),
        ("//div[@id='x']", "target"),
        ("//div[@class='a']/p", "first"),
        ("//nosuch", None),
    ]
    for xp, want in cases:
        df = engine.execute(
            f'select crawler_extract_xpath("{html}", "{xp}") as v as out;')
        assert df.collect()[0]["v"] == want, xp
    df = engine.execute(
        'select crawler_extract_xpath(cast(null as string), "//a") as v '
        'as out;')
    assert df.collect()[0]["v"] is None


def test_crawler_http_and_image(engine, tmp_path):
    page = tmp_path / "page.html"
    page.write_text("<html><body>hello http</body></html>")
    df = engine.execute(
        f'select crawler_http("file://{page}", "GET", map()) as v as out;')
    assert "hello http" in df.collect()[0]["v"]
    img = tmp_path / "img.bin"
    img.write_bytes(b"\x89PNGfake")
    df = engine.execute(
        f'select crawler_request_image("file://{img}") as v as out;')
    assert bytes(df.collect()[0]["v"]) == b"\x89PNGfake"
    # unreachable host degrades to NULL, not an error
    df = engine.execute(
        'select crawler_http("http://no.such.invalid/", "POST", '
        'map("a", "1")) as v as out;')
    assert df.collect()[0]["v"] is None


def test_keep_chinese(engine):
    df = engine.execute('''select keepChinese("abc中文def", false, "") as v as out;''')
    assert df.collect()[0]["v"] == "中文"


def test_script_udaf_grouped_agg(engine):
    """ScriptUDF with udfType=udaf — pandas GROUPED_AGG
    (reference UDFSuite udaf round-trips; python-only here)."""
    engine.execute("""
    set udafCode = '''
import pandas as pd
def geo_sum(s: pd.Series) -> float:
    return float(s.sum() * 2)
''';
    load script.`udafCode` as udafTable;
    register ScriptUDF.`udafTable` as dbl_sum options dataType="double"
        and methodName="geo_sum" and udfType="udaf";
    """)
    df = engine.execute("""
    select k, dbl_sum(v) as s from (
      select 'a' as k, 1.0 as v union all
      select 'a', 2.0 union all
      select 'b', 5.0
    ) t group by k as out;
    """)
    rows = {r["k"]: r["s"] for r in df.collect()}
    assert rows == {"a": 6.0, "b": 10.0}


def test_reference_exact_udf_spellings(engine):
    """The Scala method name IS the registered SQL name in the reference
    (Functions.scala) — scripts using those spellings keep working."""
    df = engine.execute("""
    select arrayOneHot(array(1, 3), 5) as oh,
           paddingIntArray(array(1, 2), 0, 4) as pad,
           toArrayDouble(array('1.5', '2')) as tad,
           array_concat(array(array('a'), array('b', 'c'))) as ac,
           array_slice(array('x', 'y', 'z'), 1, -1) as sl,
           map_value_int_to_double(map('a', 1, 'b', 2)) as mv,
           decodeKafka(cast('hello' as binary)) as dk,
           parse('Spark处理数据 fast') as toks
    as out;
    """)
    r = df.collect()[0]
    assert r["oh"] == [0.0, 1.0, 0.0, 1.0, 0.0]
    assert r["pad"] == [1, 2, 0, 0]
    assert r["tad"] == [1.5, 2.0]
    assert r["ac"] == ["a", "b", "c"]
    assert r["sl"] == ["y", "z"]
    assert r["mv"] == {"a": 1.0, "b": 2.0}
    assert r["dk"] == "hello"
    assert r["toks"] == ["spark", "fast", "处理", "理数", "数据"]


def test_vector_camel_case_reference_spellings(engine):
    df = engine.execute("""
    select vec_array(vecWiseAdd(vec_dense(array(1.0, 2.0)),
                                vec_dense(array(3.0, 4.0)))) as add,
           vec_array(vecCeil(vec_dense(array(1.2)))) as ceil,
           vecMean(vec_dense(array(2.0, 4.0))) as mean,
           matrixSum(array(array(1.0, 2.0), array(3.0, 4.0)), 0) as msum,
           matrix_array(array(array(1.0), array(2.0))) as marr
    as out;
    """)
    r = df.collect()[0]
    assert r["add"] == [4.0, 6.0]
    assert r["ceil"] == [2.0]
    assert r["mean"] == 3.0
    assert r["msum"] == [4.0, 6.0]
    assert r["marr"] == [[1.0], [2.0]]
