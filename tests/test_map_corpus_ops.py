"""Dictionary/lookup + corpus ET tests (reference: SQLMapValues/
SQLTableToMap train→register→UDF round-trips; TextSpec corpus patterns)."""

import pytest


def test_map_values_register_udf(engine, tmp_path):
    df = engine.execute(f"""
    set dict = '''
    {{"k":"a","v":"alpha"}}
    {{"k":"b","v":"beta"}}
    {{"k":"__unknown__","v":"dunno"}}
    ''';
    load jsonStr.`dict` as dict_t;
    train dict_t as MapValues.`{tmp_path}/mv` where inputCol="k" and outputCol="v"
        and mapMissingTo="__unknown__";
    register MapValues.`{tmp_path}/mv` as mv_lookup;
    select mv_lookup('a') as a, mv_lookup('zzz') as z,
           mv_lookup_array(array('a','b')) as arr as out;
    """)
    row = df.collect()[0]
    assert row["a"] == "alpha"
    assert row["z"] == "dunno"
    assert list(row["arr"]) == ["alpha", "beta"]


def test_map_values_missing_default_fails(engine, tmp_path):
    with pytest.raises(Exception, match="mapMissingTo"):
        engine.execute(f"""
        set dict = '''
        {{"k":"a","v":"alpha"}}
        ''';
        load jsonStr.`dict` as dict_t;
        train dict_t as MapValues.`{tmp_path}/mv2` where inputCol="k"
            and outputCol="v" and mapMissingTo="nope";
        """)


def test_table_to_map(engine, tmp_path):
    df = engine.execute(f"""
    set dict = '''
    {{"key":"x","value":"1"}}
    {{"key":"y","value":"2"}}
    ''';
    load jsonStr.`dict` as kv;
    train kv as TableToMap.`{tmp_path}/ttm`;
    register TableToMap.`{tmp_path}/ttm` as kv_get;
    select kv_get('x') as x, kv_get('nope') as missing as out;
    """)
    row = df.collect()[0]
    assert row["x"] == "1"
    assert row["missing"] is None


def test_map_et(engine):
    df = engine.execute("""
    select 'hello' as greeting, 'world' as target as conf;
    register Map.`conf` as conf_get;
    select conf_get('greeting') as g as out;
    """)
    assert df.collect()[0]["g"] == "hello"


def test_dic_or_table_to_array(engine, tmp_path):
    dic = tmp_path / "words.txt"
    dic.write_text("apple\nbanana\n")
    df = engine.execute(f"""
    select 1 as dummy as src;
    train src as DicOrTableToArray.`{tmp_path}/dta` where
        `dic.paths`="{dic}" and `dic.names`="fruit";
    register DicOrTableToArray.`{tmp_path}/dta` as get_words;
    select get_words('fruit') as words as out;
    """)
    assert list(df.collect()[0]["words"]) == ["apple", "banana"]


def test_run_script(engine):
    df = engine.execute("""
    select 1 as dummy as src;
    run src as RunScript.`` where code="select 42 as answer as from_subscript;";
    select answer from from_subscript as out;
    """)
    assert df.collect()[0]["answer"] == 42


def test_iterator_command(engine):
    df = engine.execute("""
    select explode(sequence(1, 25)) as v as nums;
    run nums as IteratorCommand.`` where input="nums" and batchSize="10"
        and script="select count(*) as n from __batch__ as batch_count;";
    """)
    assert df.collect()[0]["n_batches"] == 3


def test_send_message_dry_run(engine):
    df = engine.execute("""
    select 1 as dummy as src;
    run src as SendMessage.`` where to="a@b.c" and subject="hi"
        and content="test" as out;
    """)
    row = df.collect()[0]
    assert row["status"] == "dry-run" and row["to"] == "a@b.c"


def test_show_functions_ext(engine):
    df = engine.execute("""
    select 1 as dummy as src;
    run src as ShowFunctionsExt.`` where pattern="vec_" as out;
    """)
    names = {r["function"] for r in df.collect()}
    assert "vec_dense" in names and "vec_cosine" in names


def test_repartition_ext_alias(engine, sf_dir):
    df = engine.execute(f"""
    load parquet.`{sf_dir}/nation.parquet` as n;
    run n as RepartitionExt.`` where partitionNum="3" as out;
    """)
    assert df.rdd.getNumPartitions() == 3


# --------------------------------------------------------------------------
# corpus / vector feature ETs
# --------------------------------------------------------------------------

def test_token_analysis(engine):
    df = engine.execute("""
    set data = '''
    {"content":"Hello World 你好"}
    ''';
    load jsonStr.`data` as t;
    run t as TokenAnalysis.`` where inputCol="content" as out;
    """)
    toks = list(df.collect()[0]["keywords"])
    assert toks == ["hello", "world", "你", "好"]


def test_token_extract(engine):
    df = engine.execute("""
    set data = '''
    {"content":"apple pie with banana and cream"}
    ''';
    load jsonStr.`data` as t;
    select explode(array('apple','banana')) as w as dict_t;
    run t as TokenExtract.`` where inputCol="content" and dicTable="dict_t" as out;
    """)
    assert sorted(df.collect()[0]["keywords"]) == ["apple", "banana"]


def test_vec_map_in_place(engine):
    df = engine.execute("""
    select map('a', 1.0, 'c', 3.0) as feature as t1;
    run t1 as VecMapInPlace.`` where inputCol="feature" as out;
    """)
    v = df.collect()[0]["feature"]
    assert list(v) == [1.0, 3.0]


def test_raw_similar_in_place(engine):
    rows = [
        '{"doc_id":1,"text":"the quick brown fox jumps over the lazy dog again"}',
        '{"doc_id":2,"text":"the quick brown fox jumps over the lazy dog again"}',
        '{"doc_id":3,"text":"completely different content about spark engines"}',
    ]
    engine.execute("set docs = '''%s''';" % "\n".join(rows))
    df = engine.execute("""
    load jsonStr.`docs` as t;
    run t as RawSimilarInPlace.`` where idCol="doc_id" and textCol="text"
        and threshold="0.9" as out;
    """)
    groups = {r["doc_id"]: r["__similar__"] for r in df.collect()}
    assert groups[1] == groups[2] == 1
    assert groups[3] == 3


def test_corpus_explain(engine):
    df = engine.execute("""
    set data = '''
    {"text":"spark spark flink"}
    {"text":"spark beam"}
    ''';
    load jsonStr.`data` as t;
    run t as CorpusExplainInPlace.`` where inputCol="text" as out;
    """)
    stats = {r["token"]: (r["tf"], r["df"]) for r in df.collect()}
    assert stats["spark"] == (3, 2)
    assert stats["flink"] == (1, 1)


def test_reduce_features_pca(engine):
    df = engine.execute("""
    select array(1.0, 2.0, 3.0, 4.0) as features
    union all select array(2.0, 3.0, 4.0, 5.0)
    union all select array(9.0, 1.0, 2.0, 8.0) as t1;
    run t1 as ReduceFeaturesInPlace.`` where inputCol="features" and k="2" as out;
    """)
    rows = df.collect()
    assert all(len(r["features"]) == 2 for r in rows)


def test_row_matrix_column_similarity(engine):
    df = engine.execute("""
    select array(1.0, 0.0, 1.0) as features
    union all select array(1.0, 1.0, 0.0)
    union all select array(0.0, 1.0, 1.0) as t1;
    run t1 as RowMatrix.`` where inputCol="features" as out;
    """)
    sims = {(r["i"], r["j"]): r["similarity"] for r in df.collect()}
    assert len(sims) == 3  # 3 column pairs
    for v in sims.values():
        assert 0.0 <= v <= 1.0


def test_token_analysis_cjk_bigram_fallback(engine):
    """CJK bigram segmentation: the vendored, dictionary-free fallback
    for the reference's Ansj/jieba word segmentation — useJieba=true
    without jieba installed degrades to it instead of failing, and it
    runs JVM-side (no Python eval in the plan)."""
    engine.execute("""
    set zh = '''
    {"content":"Spark处理大数据很快"}
    {"content":"只有一个字: 好"}
    ''';
    load jsonStr.`zh` as zh_t;
    run zh_t as TokenAnalysis.`` where segmenter="bigram" as out;
    """)
    df = engine.spark.table("out")
    toks = {r["content"]: r["keywords"] for r in df.collect()}
    assert toks["Spark处理大数据很快"] == \
        ["spark", "处理", "理大", "大数", "数据", "据很", "很快"]
    assert toks["只有一个字: 好"] == ["只有", "有一", "一个", "个字", "好"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # useJieba=true degrades to the same fallback when jieba is absent
    try:
        import jieba  # noqa: F401
    except ImportError:
        engine.execute(
            'run zh_t as TokenAnalysis.`` where useJieba="true" as out2;')
        toks2 = {r["content"]: r["keywords"]
                 for r in engine.spark.table("out2").collect()}
        assert toks2 == toks


def test_script_udf_java(engine):
    """lang="java": UDF source compiled at runtime with the JDK's javac
    (reference compiles with janino — JavaRuntimeCompileUDF.scala) and
    registered via registerJavaFunction."""
    df = engine.execute("""
    set judf = '''
import org.apache.spark.sql.api.java.UDF2;
public class AddPrefix implements UDF2<String, Long, String> {
    public String call(String s, Long n) { return s + ":" + (n * 2); }
}
''';
    register ScriptUDF.`judf` as add_prefix options lang="java"
        and dataType="string";
    select add_prefix('x', 21L) as v as out;
    """)
    assert df.collect()[0]["v"] == "x:42"


def test_script_udf_java_compile_error_renders(engine):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="compilation failed"):
        engine.execute("""
        set badj = '''
public class Broken implements Object {
    this is not java
}
''';
        register ScriptUDF.`badj` as broken_fn options lang="java";
        """)


def test_script_udf_scala_documented_drop(engine):
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="scala"):
        engine.execute("""
        set sudf = '''def apply(a: Int) = a''';
        register ScriptUDF.`sudf` as sfn options lang="scala";
        """)


def test_script_udf_java_udaf(engine):
    """lang="java" + udfType="udaf": runtime-compiled aggregate
    registered via registerJavaUDAF (reference
    JavaRuntimeCompileUDAF.scala)."""
    df = engine.execute("""
    set judaf = '''
import org.apache.spark.sql.Row;
import org.apache.spark.sql.expressions.MutableAggregationBuffer;
import org.apache.spark.sql.expressions.UserDefinedAggregateFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

public class SumSquares extends UserDefinedAggregateFunction {
    public StructType inputSchema() {
        return new StructType().add("v", DataTypes.LongType);
    }
    public StructType bufferSchema() {
        return new StructType().add("acc", DataTypes.LongType);
    }
    public DataType dataType() { return DataTypes.LongType; }
    public boolean deterministic() { return true; }
    public void initialize(MutableAggregationBuffer b) { b.update(0, 0L); }
    public void update(MutableAggregationBuffer b, Row in) {
        if (!in.isNullAt(0)) {
            long v = in.getLong(0);
            b.update(0, b.getLong(0) + v * v);
        }
    }
    public void merge(MutableAggregationBuffer b, Row other) {
        b.update(0, b.getLong(0) + other.getLong(0));
    }
    public Object evaluate(Row b) { return b.getLong(0); }
}
''';
    register ScriptUDF.`judaf` as sum_sq options lang="java" and udfType="udaf";
    select sum_sq(id) as v from range(4) as out;
    """)
    assert df.collect()[0]["v"] == 0 + 1 + 4 + 9


def test_script_udf_java_with_package(engine):
    """A `package` declaration registers the fully-qualified class
    (review finding: the bare name raised ClassNotFound)."""
    df = engine.execute("""
    set pkgudf = '''
package com.example.udfs;
import org.apache.spark.sql.api.java.UDF1;
public class Neg implements UDF1<Long, Long> {
    public Long call(Long a) { return -a; }
}
''';
    register ScriptUDF.`pkgudf` as neg_fn options lang="java"
        and dataType="long";
    select neg_fn(5L) as v as out;
    """)
    assert df.collect()[0]["v"] == -5


def test_map_et_int_keys(engine):
    # dict keys are stringified at load — int key columns must still hit
    df = engine.execute("""
    set dict = '''
    {"1":"one","2":"two"}
    ''';
    load jsonStr.`dict` as dict_t;
    register Map.`dict_t` as map_fn;
    set data = '''
    {"k":1}
    ''';
    load jsonStr.`data` as t;
    select map_fn('1') as v1 as output;
    """)
    assert df.collect()[0]["v1"] == "one"


def test_table_to_map_int_key_column(engine, tmp_path):
    df = engine.execute(f"""
    set dict = '''
    {{"key":1,"value":"one"}}
    {{"key":2,"value":"two"}}
    ''';
    load jsonStr.`dict` as dict_t;
    train dict_t as TableToMap.`{tmp_path}/ttm` as t;
    register TableToMap.`{tmp_path}/ttm` as ttm_fn;
    set data = '''
    {{"k":1}}
    {{"k":3}}
    ''';
    load jsonStr.`data` as t2;
    select k, ttm_fn(k) as v from t2 as output;
    """)
    rows = {r["k"]: r["v"] for r in df.collect()}
    assert rows == {1: "one", 3: None}


def test_map_values_int_dict_table(engine, tmp_path):
    # train accepts an int inputCol (Spark coerces the comparison);
    # register must serve it rather than KeyError on the default lookup
    df = engine.execute(f"""
    set dict = '''
    {{"code":0,"label":"default"}}
    {{"code":1,"label":"alpha"}}
    ''';
    load jsonStr.`dict` as dict_t;
    train dict_t as MapValues.`{tmp_path}/mv` where inputCol="code"
        and outputCol="label" and mapMissingTo="0" as t;
    register MapValues.`{tmp_path}/mv` as mv_fn;
    set data = '''
    {{"code":1}}
    {{"code":9}}
    ''';
    load jsonStr.`data` as t2;
    select code, mv_fn(code) as lab from t2 as output;
    """)
    rows = {r["code"]: r["lab"] for r in df.collect()}
    assert rows == {1: "alpha", 9: "default"}


def test_home_prefix_skipped_for_name_paths(spark, tmp_path):
    """With a per-owner home set, ETs whose path is a table name must
    NOT have it rewritten to home/owner/name."""
    from streamingpro_spark import Engine
    eng = Engine(spark)
    eng.context.home = str(tmp_path)
    eng.context.owner = "alice"
    df = eng.execute("""
    set dict = '''
    {"key":"a","value":"1"}
    ''';
    load jsonStr.`dict` as named_dict;
    register Map.`named_dict` as hm_fn;
    select hm_fn('key') as v as output;
    """)
    assert df.collect()[0]["v"] == "a"
    # !desc on a view name works under home too
    out = eng.execute("""
    set data = '''
    {"x":1}
    ''';
    load jsonStr.`data` as desc_me;
    !desc desc_me;
    """)
    assert "x" in [r["col_name"] for r in out.collect()]


def test_token_analysis_fmm_dictionary(engine, tmp_path):
    """segmenter=fmm: dictionary forward-maximum-match — longest
    dictionary word wins, out-of-vocab CJK falls back to single chars,
    latin runs lowercase; missing/empty dict renders a clear error."""
    d = tmp_path / "words.txt"
    d.write_text("中文\n中文分词\n分词\n引擎\n", encoding="utf-8")
    df = engine.execute(f"""
    select 'Spark中文分词引擎X测试' as content as t;
    run t as TokenAnalysis.`` where segmenter="fmm"
    and dict="{d}" as out;
    select keywords from out as final;
    """)
    got = df.collect()[0]["keywords"]
    # 中文分词 (len 4) beats 中文+分词; 引擎 in dict; 测/试 OOV singles
    assert got == ["spark", "中文分词", "引擎", "x", "测", "试"], got
    import pytest as _pytest
    with _pytest.raises(Exception, match="dict="):
        engine.execute("""
        select 'x' as content as t2;
        run t2 as TokenAnalysis.`` where segmenter="fmm" as bad;
        """)


def test_token_analysis_pos_natures_fmm(engine, tmp_path):
    """POS natures (SQLTokenAnalysis.scala:93-131 parity): a
    tag-annotated fmm dict + ignoreNature="false" emits the reference's
    `word/nature` strings; filterNatures keeps only those natures;
    deduplicateResult drops repeats; tagless segmenters render the
    documented drop (VERDICT r5 ask #7)."""
    d = tmp_path / "tagged.txt"
    # jieba dict format: word [freq] tag; 引擎 deliberately tagless -> n
    d.write_text("中文分词 10 nz\n测试 v\n引擎\n", encoding="utf-8")
    base = f"""
    select 'Spark中文分词引擎测试测试' as content as t;
    run t as TokenAnalysis.`` where segmenter="fmm" and dict="{d}"
    """
    got = engine.execute(base + ' and ignoreNature="false" as o1;'
                         "select keywords from o1 as f1;"
                         ).collect()[0]["keywords"]
    assert got == ["spark/en", "中文分词/nz", "引擎/n", "测试/v",
                   "测试/v"], got
    got = engine.execute(base + ' and filterNatures="v,nz" as o2;'
                         "select keywords from o2 as f2;"
                         ).collect()[0]["keywords"]
    assert got == ["中文分词", "测试", "测试"], got
    got = engine.execute(base + ' and ignoreNature="false" and '
                         'deduplicateResult="true" as o3;'
                         "select keywords from o3 as f3;"
                         ).collect()[0]["keywords"]
    assert got == ["spark/en", "中文分词/nz", "引擎/n", "测试/v"], got
    import pytest as _pytest
    for seg_clause in ("", ' and segmenter="bigram"'):
        with _pytest.raises(Exception, match="POS-tagged"):
            engine.execute(
                "select 'x' as content as tp;"
                f'run tp as TokenAnalysis.`` where ignoreNature="false"'
                f"{seg_clause} as badp;")
