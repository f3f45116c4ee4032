"""Demonstrate (verdict item 6) that ensure_parallelism is a no-op at
scale: over an input whose scan already yields >= defaultParallelism
partitions (here: the sf0.1 documents copied to 64 parquet files,
written OUTSIDE the bench to a tempdir), the spread does not fire and
the text-family plan has ZERO exchanges."""
import sys, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from streamingpro_spark import Engine

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="spk_atscale_")
src = "/root/testdata/sf0.1/documents.parquet"
# 64 files stands in for the at-scale layout (files >> cores); the
# copy is a demo artifact, not a bench input
spark.read.parquet(src).repartition(64).write.parquet(f"{root}/docs64")
eng = Engine(spark)
df = eng.execute(f"""
load parquet.`{root}/docs64` as docs;
run docs as LanguageID.`` as lid;
select doc_id, lang_pred from lid as out;
""")
n_scan = df.rdd.getNumPartitions()
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
plan = df._jdf.queryExecution().explainString(mode)
hdr = (f"# ensure_parallelism at-scale no-op demo\n"
       f"# input: sf0.1 documents rewritten as 64 parquet files (outside the bench)\n"
       f"# defaultParallelism=32; result partitions={n_scan}\n"
       f"# assertion: no Exchange of any kind in the plan below\n\n")
assert "Exchange" not in plan, plan
assert n_scan >= 32, n_scan
with open("/root/repo/plans/r12/ensure_parallelism_at_scale_demo.txt", "w") as f:
    f.write(hdr + plan)
print("OK: no Exchange; scan partitions =", n_scan)
import shutil; shutil.rmtree(root)
