package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.feat.MinHash
import graft.model.GraftConfig

/** Diagnostic: per-column memory/disk footprint of the features cache.
  *
  * The round-4 scaling runs measured the 32M-row features cache (14.5 GB
  * deserialized) competing with execution memory (−17% per-row throughput)
  * — this tool answers "which columns pay for that?" so the round-5 cache
  * diet cuts the right ones. Usage:
  *   sbt "runMain graft.tools.CacheAudit /tmp/graft_scaling_corpus_g192000"
  */
object CacheAudit {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_scaling_corpus_g192000")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val images = spark.read.parquet(path)
    val full = MinHash.featurize(spark, images, GraftConfig(seed = 7L)).toDF()
      .drop("shingles").repartition(col("row_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = full.count()

    def audit(name: String, df: DataFrame): Unit = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached.count()
      // the just-persisted relation is the newest cached RDD
      val info = spark.sparkContext.getRDDStorageInfo
        .filter(_.numCachedPartitions > 0).maxBy(_.id)
      println(f"$name%-28s mem=${info.memSize / 1e6}%10.1f MB  " +
        f"disk=${info.diskSize / 1e6}%8.1f MB  (${(info.memSize + info.diskSize) / n}%d B/row)")
      cached.unpersist(blocking = true)
    }

    println(s"n = $n rows from $path")
    audit("full (row_id..phash)", full.select("row_id", "caption", "minhash", "simhash", "phash"))
    audit("minhash only", full.select("row_id", "minhash"))
    audit("caption only", full.select("row_id", "caption"))
    audit("slim (no caption)", full.select("row_id", "minhash", "simhash", "phash"))
    audit("HOT cache (r5 diet)", full.select("row_id", "minhash", "phash"))
    audit("ids/phash/simhash", full.select("row_id", "simhash", "phash"))
    spark.stop()
  }
}
