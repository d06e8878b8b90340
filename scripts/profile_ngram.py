"""Stage-level sf1-vs-sf3 profile of neardup_ngram (slope gate 1.332 RED).

Times each pipeline stage in the same warm session to localize the
superlinear stage: hash materialization, band keys, candidate join
(pre/post distinct counts), and the full query.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "100g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from rabitq_spark.functions.text import char_codes, rolling_gram_hashes, banded_minhash_key, jaccard
from rabitq_spark.operators.dedup import _banded_candidates_exploded

def profile(sf_dir, label):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = {}
    t0 = time.perf_counter()
    lowered = docs.select(F.col("doc_id"), F.lower(F.col("text")).alias("lt")).cache()
    n_docs = lowered.count()
    t["lower"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    codes = lowered.select("doc_id", char_codes(F.col("lt")).alias("cs")).cache()
    codes.count()
    t["char_codes"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    hashed = codes.select("doc_id", rolling_gram_hashes(F.col("cs"), 5).alias("hs")).cache()
    tot_grams = hashed.select(F.sum(F.size("hs"))).collect()[0][0]
    t["gram_hash"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    keys = hashed.filter(F.size("hs") > 0).select(
        "doc_id", *[banded_minhash_key("hs", b, 5).alias(f"k{b}") for b in range(12)]
    ).cache()
    keys.count()
    t["band_keys"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = _banded_candidates_exploded(keys, 12).cache()
    n_cand = cand.count()
    t["cand_join"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sa = hashed.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    sb = hashed.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    out = (cand.join(sa, "id_a").join(sb, "id_b")
        .repartition(32)
        .select("id_a", "id_b", jaccard("hs_a", "hs_b").alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8))
    n_out = out.count()
    t["verify"] = time.perf_counter() - t0

    print(f"== {label}: docs={n_docs} grams={tot_grams} cand_pairs={n_cand} out={n_out}")
    for k, v in t.items():
        print(f"   {k:12s} {v:7.2f}s")
    for df in (lowered, codes, hashed, keys, cand):
        df.unpersist()
    return t, n_cand

t1, c1 = profile("/root/repo/.benchdata/sf1.0", "sf1")
t3, c3 = profile("/root/repo/.benchdata/sf3.0", "sf3")
print("== ratios (sf3/sf1):")
for k in t1:
    print(f"   {k:12s} {t3[k]/max(t1[k],1e-9):5.2f}x")
print(f"   cand_pairs   {c3/max(c1,1):5.2f}x")
spark.stop()
