import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
from dask_expr_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("exp_nd", cpus=8)
sf_dir = "/root/testdata/sf0.001"
from dask_expr_spark.sources.io import read_parquet
from dask_expr_spark.functions.dedup import (lsh_band_keys, md5_band_hash,
    md5_perm_hash, md5_token_hash, minhash_sig_expr)
from dask_expr_spark.streaming import ops as S

src = tempfile.mkdtemp(prefix="nd_")
docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
docs.to_spark().select("doc_id", "text") \
    .where(F.size(F.split(F.col("text"), " ")) >= 3).coalesce(1) \
    .write.mode("overwrite").parquet(src)
batch = spark.read.schema("doc_id long, text string").parquet(src)
print("docs:", batch.count())

# phase A: banded rows (portable md5 family), batch mode
t0 = time.time()
sig = minhash_sig_expr(F.col("text"), k=3, num_perm=32,
                       token_hash=md5_token_hash, perm_hash=md5_perm_hash)
banded = (batch.select("doc_id",
                       F.explode(lsh_band_keys(sig, 8, 4, band_hash=md5_band_hash)).alias("bb"))
          .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")))
n = banded.count()
tA = time.time() - t0
print(f"A banded count: {n} rows in {tA:.2f}s")
t0 = time.time()
g = banded.groupBy("band","bkey").count().where("count>1").count()
tA2 = time.time() - t0
print(f"A2 groups with >1: {g} in {tA2:.2f}s")
ng = banded.select("band","bkey").distinct().count()
print("total groups:", ng)

# phase B: the full streaming query
t0 = time.time()
stream = spark.readStream.schema("doc_id long, text string").parquet(src)
q = S.run_to_memory(S.near_dedup_candidates_stream(stream, portable_hash=True),
                    "nd_out", output_mode="append")
rows = spark.sql("SELECT * FROM nd_out").count()
q.stop()
tB = time.time() - t0
print(f"B streaming: {rows} pairs in {tB:.2f}s")
