import time, sys
sys.path.insert(0,'/root/repo')
from pyspark.sql import SparkSession, functions as F
from catabra_pandas_spark.sources import read_table
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.driver.memory","16g")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
docs = read_table(spark, sf, "documents").cache(); print("docs", docs.count(), flush=True)

def bench(label, df):
    t0=time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter()-t0:.2f}", flush=True)

from catabra_pandas_spark.pipeline.text import _tokens
bench("tokens only", docs.select("doc_id", _tokens(F.col("text")).alias("toks")))
bench("tokens+distinct", docs.select("doc_id", F.array_distinct(_tokens(F.col("text"))).alias("t2")))
bench("tokens+distinct+sort", docs.select("doc_id", F.array_sort(F.array_distinct(_tokens(F.col("text")))).alias("t3")))
bench("fingerprint full", docs.select("doc_id", F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(F.col("text")))))).alias("fp")))

from catabra_pandas_spark.pipeline.dedup import shingles, _MERSENNE
sh = shingles(F.col("text"), 2)
bench("shingles only", docs.select("doc_id", sh.alias("sh")))
hashes = F.transform(sh, lambda s: F.abs(F.xxhash64(s)) % F.lit(_MERSENNE))
bench("shingle hashes", docs.select("doc_id", hashes.alias("h")))
def perm(a, b):
    return lambda h: (h*F.lit(a)+F.lit(b))%F.lit(_MERSENNE)
for nperm in (1, 4, 16):
    sig = F.array(*[F.array_min(F.transform(hashes, perm(3+i, 7*i))) for i in range(nperm)])
    bench(f"minhash {nperm} perms", docs.select("doc_id", sig.alias("sig")))
