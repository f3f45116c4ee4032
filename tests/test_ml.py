"""ML ET round-trip tests (reference: MLLibSpec.scala pattern —
train → batchPredict → register → predict UDF)."""

import pytest


@pytest.fixture()
def iris_engine(engine):
    rows = []
    # two separable blobs
    for i in range(20):
        rows.append('{"features":[%f,%f],"label":0.0}' % (1.0 + i * 0.01, 1.0))
        rows.append('{"features":[%f,%f],"label":1.0}' % (5.0 + i * 0.01, 5.0))
    engine.execute("set irisdata = '''%s''';" % "\n".join(rows))
    engine.execute("""
    load jsonStr.`irisdata` as raw;
    select vec_dense(features) as features, label from raw as training;
    """)
    return engine


def test_random_forest_train_and_batch_predict(iris_engine, tmp_path):
    engine = iris_engine
    model_path = str(tmp_path / "rf")
    engine.execute(f"""
    train training as RandomForest.`{model_path}` where numTrees="3" and seed="42";
    """)
    df = engine.execute(f"""
    predict training as RandomForest.`{model_path}`;
    """)
    rows = df.select("label", "prediction").collect()
    acc = sum(1 for r in rows if r["label"] == r["prediction"]) / len(rows)
    assert acc > 0.95


def test_register_model_udf(iris_engine, tmp_path):
    engine = iris_engine
    model_path = str(tmp_path / "lr")
    engine.execute(f"""
    train training as LogisticRegression.`{model_path}` where maxIter="20";
    register LogisticRegression.`{model_path}` as lr_predict;
    """)
    df = engine.execute("""
    select lr_predict(features) as p, label from raw as out;
    """)
    rows = df.collect()
    acc = sum(1 for r in rows if r["label"] == r["p"]) / len(rows)
    assert acc > 0.95


def test_kmeans(iris_engine, tmp_path):
    engine = iris_engine
    df = engine.execute(f"""
    train training as KMeans.`{tmp_path}/km` where k="2" and seed="42";
    predict training as KMeans.`{tmp_path}/km`;
    """)
    preds = df.select("features", "prediction").collect()
    # the two blobs land in different clusters
    c0 = {r["prediction"] for r in preds if r["features"][0] < 3}
    c1 = {r["prediction"] for r in preds if r["features"][0] > 3}
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1


def test_tfidf_in_place(engine, tmp_path):
    df = engine.execute(f"""
    set docs = '''
    {{"content":"spark engine fast engine"}}
    {{"content":"slow query slow scan"}}
    ''';
    load jsonStr.`docs` as corpus;
    train corpus as TfIdfInPlace.`{tmp_path}/tfidf` where inputCol="content";
    """)
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["content"].size > 0  # replaced by tf-idf vector


def test_word2vec_in_place(engine, tmp_path):
    df = engine.execute(f"""
    set docs = '''
    {{"content":"spark engine fast"}}
    {{"content":"slow query scan"}}
    ''';
    load jsonStr.`docs` as corpus2;
    train corpus2 as Word2VecInPlace.`{tmp_path}/w2v` where inputCol="content" and vectorSize="8";
    """)
    rows = df.collect()
    assert rows[0]["content"].size == 8


def test_scaler_in_place(engine, tmp_path):
    df = engine.execute(f"""
    set nums = '''
    {{"a": 0.0, "b": 10.0}}
    {{"a": 5.0, "b": 20.0}}
    {{"a": 10.0, "b": 30.0}}
    ''';
    load jsonStr.`nums` as numtable;
    train numtable as ScalerInPlace.`{tmp_path}/scaler` where inputCols="a,b" and scaleMethod="min-max";
    """)
    vals = sorted(r["a"] for r in df.collect())
    assert vals == [0.0, 0.5, 1.0]


def test_discretizer(engine, tmp_path):
    df = engine.execute(f"""
    select explode(array(1.0, 5.0, 9.0)) as x as xs;
    train xs as Discretizer.`{tmp_path}/disc` where method="bucketizer"
        and inputCol="x" and splits="4,8";
    """)
    buckets = sorted(r["x_bucket"] for r in df.collect())
    assert buckets == [0.0, 1.0, 2.0]


def test_string_index_register(engine, tmp_path):
    engine.execute(f"""
    select explode(array("a","b","a","c","a")) as cat as cats;
    train cats as StringIndex.`{tmp_path}/si` where inputCol="cat";
    register StringIndex.`{tmp_path}/si` as cat_idx;
    """)
    df = engine.execute('select cat_idx("a") as a, cat_idx("zzz") as missing as out;')
    r = df.collect()[0]
    assert r["a"] == 0.0      # most frequent → index 0
    assert r["missing"] == -1.0


def test_keep_version_trains_and_loads_latest(iris_engine, tmp_path):
    mdir = str(tmp_path / "lr_versions")
    iris_engine.execute(f"""
    train training as LogisticRegression.`{mdir}` where maxIter="2"
        and keepVersion="true";
    train training as LogisticRegression.`{mdir}` where maxIter="3"
        and keepVersion="true";
    """)
    import os
    assert sorted(d for d in os.listdir(mdir) if d.startswith("_model_")) \
        == ["_model_0", "_model_1"]
    # predict resolves the latest version
    df = iris_engine.execute(f"""
    predict training as LogisticRegression.`{mdir}` as out;
    """)
    assert "prediction" in df.columns
    assert df.count() > 0


def test_tfidf_standalone_roundtrip(engine, tmp_path):
    """TfIdf (int term ids): train -> batchPredict -> register; the
    serving UDF must agree with the batch path exactly."""
    engine.execute("""
    set tdocs = '''
    {"words":[1,2,2,3]}
    {"words":[2,4]}
    {"words":[1,5,5,5]}
    ''';
    load jsonStr.`tdocs` as tcorpus;
    """)
    path = tmp_path / "tfidf_alg"
    df = engine.execute(f"""
    train tcorpus as TfIdf.`{path}` where inputCol="words" and numFeatures="32";
    predict tcorpus as TfIdf.`{path}`;
    """)
    batch = [r["tfidf"] for r in df.collect()]
    assert all(v.numNonzeros() > 0 for v in batch)
    # term 2 appears in 2 of 3 docs, term 4 in 1 -> idf(4) > idf(2)
    engine.execute(f"register TfIdf.`{path}` as tfidf_fn;")
    served = [r[0] for r in engine.execute(
        "select tfidf_fn(words) as v from tcorpus as out;").collect()]
    for b, s in zip(batch, served):
        assert b.toArray().tolist() == pytest.approx(s.toArray().tolist())


def test_hash_tfidf_standalone_roundtrip(engine, tmp_path):
    """HashTfIdf (string terms, binary TF): the pure-python murmur3 in
    the serving UDF must produce the same indices/values as the JVM
    HashingTF batch path."""
    engine.execute("""
    set hdocs = '''
    {"words":["spark","fast","engine","engine"]}
    {"words":["slow","scan","spark"]}
    {"words":["query","planner","cost","spark","z"]}
    ''';
    load jsonStr.`hdocs` as hcorpus;
    """)
    path = tmp_path / "hashtfidf_alg"
    df = engine.execute(f"""
    train hcorpus as HashTfIdf.`{path}` where inputCol="words" and numFeatures="64";
    predict hcorpus as HashTfIdf.`{path}`;
    """)
    batch = [r["tfidf"] for r in df.collect()]
    engine.execute(f"register HashTfIdf.`{path}` as hash_tfidf_fn;")
    served = [r[0] for r in engine.execute(
        "select hash_tfidf_fn(words) as v from hcorpus as out;").collect()]
    for b, s in zip(batch, served):
        assert sorted(b.indices.tolist()) == sorted(s.indices.tolist())
        assert b.toArray().tolist() == pytest.approx(s.toArray().tolist())


def test_python_alg_train_predict_roundtrip(engine, tmp_path):
    """PythonAlg: user train() runs driver-side over a bounded pandas
    slice; user predict() runs DISTRIBUTED via mapInPandas against the
    saved artifacts (native stand-in for SQLPythonAlg.scala)."""
    path = tmp_path / "pyalg"
    engine.execute(f"""
    select explode(sequence(1, 50)) as v as pa_in;
    train pa_in as PythonAlg.`{path}` where code='''
import json, os
def train(pdf, model_path):
    with open(os.path.join(model_path, "m.json"), "w") as f:
        json.dump({{"mean": float(pdf["v"].mean())}}, f)
''';
    """)
    assert (path / "m.json").exists()
    df = engine.execute(f"""
    predict pa_in as PythonAlg.`{path}` where code='''
import json, os
def predict(pdf, model_path):
    with open(os.path.join(model_path, "m.json")) as f:
        m = json.load(f)["mean"]
    pdf["centered"] = pdf["v"] - m
    return pdf
''' and schema="st(field(v,integer),field(centered,double))";
    """)
    rows = df.collect()
    assert len(rows) == 50
    assert abs(sum(r["centered"] for r in rows)) < 1e-6   # mean-centered


def test_logistic_regressor_reference_alias(iris_engine, tmp_path):
    """The reference registry name is LogisticRegressor
    (TrainAdaptor.scala) — both names resolve."""
    engine = iris_engine
    df = engine.execute(f"""
    train training as LogisticRegressor.`{tmp_path}/lra` where maxIter="10";
    predict training as LogisticRegressor.`{tmp_path}/lra`;
    """)
    rows = df.select("label", "prediction").collect()
    acc = sum(1 for r in rows if r["label"] == r["prediction"]) / len(rows)
    assert acc > 0.95
