"""Stage-level timing for q_ann_ivf_topk at a given sf dir (default sf0.1).

Not a test — a scratch profiler for the round-4 perf pass. Run:
    python scripts/profile_ivf.py [sf_dir]
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from etl_finance_spark.catalog import table  # noqa: E402
from etl_finance_spark.llm import similarity as S  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()


def mark(label, prev=[t0]):
    now = time.time()
    print(f"{now - prev[0]:7.2f}s  {label}", flush=True)
    prev[0] = now


emb = S.with_unit_vec(table(spark, sf_dir, "embeddings"))
emb = emb.persist()
n = emb.count()
mark(f"persist+count corpus ({n} rows)")

cent = S.ivf_centroids(emb)
mark("ivf_centroids (2 Lloyd passes + checkpoint)")

corpus_cells = S.ivf_assign(emb, cent, 1).select(
    F.col("vec_id").alias("cid"), "cell"
)
queries = emb.filter(F.col("vec_id") < S.N_QUERY)
query_cells = S.ivf_assign(queries, cent, S.N_PROBE).select(
    F.col("vec_id").alias("qid"), "cell"
)
# the PRODUCTION candidate join, not a re-implementation — hand-rolled
# copies drifted from salted_join once already this round
from etl_finance_spark.operators.scale import salted_join  # noqa: E402

cand = (
    salted_join(corpus_cells, query_cells, "cell",
                salt=S.PAIR_SALTS, salt_on=["cid"])
    .filter(F.col("cid") != F.col("qid"))
    .select("qid", "cid")
)
nc = cand.count()
mark(f"salted routing + candidates ({nc} pairs)")

qv = queries.select(F.col("vec_id").alias("qid"), F.col("vec").alias("qv"),
                    F.col("nrm").alias("qn"))
cv = emb.select(F.col("vec_id").alias("cid"), F.col("vec").alias("cv"),
                F.col("nrm").alias("cn"))
pairs = cand.join(F.broadcast(qv), "qid").join(cv, "cid")
cos = F.round(S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
from pyspark.sql.window import Window  # noqa: E402
w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
out = (
    pairs.withColumn("cosine", cos)
    .withColumn("rn", F.row_number().over(w))
    .filter(F.col("rn") <= S.TOP_K)
    .select("qid", "cid", "cosine")
)
nr = out.count()
mark(f"rerank + topk ({nr} rows)")

# full end-to-end fresh (the bench shape)
emb.unpersist()
t1 = time.time()
emb2 = S.with_unit_vec(table(spark, sf_dir, "embeddings"))
q2 = emb2.filter(F.col("vec_id") < S.N_QUERY)
res = S.ann_ivf_topk(emb2, q2, S.TOP_K)
c = res.count()
print(f"{time.time() - t1:7.2f}s  FULL warm end-to-end ({c} rows)", flush=True)
spark.stop()
