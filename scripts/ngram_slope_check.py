"""Replicates bench.py's _llm_slope_probe for neardup_ngram only."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, Observation, functions as F

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "64g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from rabitq_spark.queries import SPARK_QUERIES
from rabitq_spark.operators.dedup import release_caches

fn = SPARK_QUERIES["neardup_ngram"]
def timed(sf):
    obs = Observation()
    t0 = time.perf_counter()
    df = fn(spark, f"/root/repo/.benchdata/{sf}").observe(obs, F.count(F.lit(1)).alias("n"))
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, int(obs.get["n"])

t1, n1 = timed("sf1.0"); release_caches()
t3, n3 = timed("sf3.0"); release_caches()
slope = (t3 / t1) / max(3.0, n3 / max(n1, 1))
print(f"sf1: {t1:.1f}s rows={n1}  sf3: {t3:.1f}s rows={n3}  slope={slope:.3f} gate={'GREEN' if slope<=1.3 else 'RED'}")
spark.stop()
