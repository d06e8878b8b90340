"""Round-8 ngram slope diagnosis, part 2: real-path candidate analysis.

Counts at sf1/sf3: (a) candidate pairs by number of band hits (is a
`>= 2 bands` prune effective, and what band-hit counts do the TRUE
output pairs have?), (b) size-ratio prefilter effectiveness
(min(|A|,|B|)/max >= threshold is a NECESSARY condition for J >= t).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "64g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from rabitq_spark.functions.text import char_codes, rolling_gram_hashes, banded_minhash_key, jaccard
from rabitq_spark.operators.dedup import _widen

def analyze(sf_dir, label):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lowered = _widen(docs).select("doc_id", F.lower(F.col("text")).alias("lt")).cache()
    codes = lowered.select("doc_id", char_codes(F.col("lt")).alias("cs")).cache()
    hashed = codes.select("doc_id", rolling_gram_hashes(F.col("cs"), 5).alias("hs")).cache()
    hashed.count()
    t0 = time.perf_counter()
    keys = hashed.filter(F.size("hs") > 0).select(
        "doc_id", F.size("hs").alias("sz"),
        *[banded_minhash_key("hs", b, 5).alias(f"k{b}") for b in range(12)]
    ).cache()
    keys.count()
    t_keys = time.perf_counter() - t0

    kv = keys.select(
        "doc_id", "sz",
        F.explode(F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"k{b}").alias("k"))
                            for b in range(12)])).alias("bk"),
    ).select("doc_id", "sz", F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))
    l, r = kv.alias("l"), kv.alias("r")
    t0 = time.perf_counter()
    pairs = (l.join(r, (F.col("l.b") == F.col("r.b")) & (F.col("l.k") == F.col("r.k"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"),
                F.col("l.sz").alias("sz_a"), F.col("r.sz").alias("sz_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b").agg(F.count("*").alias("nhits"))
        .cache())
    hit_dist = pairs.groupBy("nhits").count().orderBy("nhits").collect()
    t_cand = time.perf_counter() - t0
    n_cand = sum(rw["count"] for rw in hit_dist)
    ratio_ok = pairs.filter(F.least("sz_a", "sz_b") >= 0.8 * F.greatest("sz_a", "sz_b")).count()

    # true pairs and their band-hit counts
    sa = hashed.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    sb = hashed.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    t0 = time.perf_counter()
    ver = (pairs.join(sa, "id_a").join(sb, "id_b").repartition(64)
        .select("id_a", "id_b", "nhits", jaccard("hs_a", "hs_b").alias("j"))
        .filter(F.col("j") >= 0.8).cache())
    n_true = ver.count()
    t_verify = time.perf_counter() - t0
    true_hits = ver.groupBy("nhits").count().orderBy("nhits").collect()
    jdist = pairs.sample(0.02, seed=1).join(sa, "id_a").join(sb, "id_b") \
        .select(jaccard("hs_a", "hs_b").alias("j")) \
        .select(F.expr("percentile_approx(j, array(0.5,0.9,0.99,0.999))")).collect()[0][0]

    print(f"== {label}: cand={n_cand} true={n_true} t_keys={t_keys:.1f} t_cand={t_cand:.1f} t_verify={t_verify:.1f}")
    print("   band-hit dist (all cand):", [(rw['nhits'], rw['count']) for rw in hit_dist])
    print("   band-hit dist (true):    ", [(rw['nhits'], rw['count']) for rw in true_hits])
    print(f"   size-ratio>=0.8 pass: {ratio_ok}/{n_cand} = {ratio_ok/max(n_cand,1):.3f}")
    print(f"   cand jaccard percentiles (50/90/99/99.9): {[round(x,3) for x in jdist]}")
    for df in (lowered, codes, hashed, keys, pairs, ver):
        df.unpersist()

analyze("/root/repo/.benchdata/sf1.0", "sf1")
analyze("/root/repo/.benchdata/sf3.0", "sf3")
spark.stop()
