package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.feat.MinHash
import graft.gen.SyntheticCorpus
import graft.io.TableIO
import graft.lsh.Banding
import graft.model.GraftConfig

/** Prints `explain(formatted)` for the load-bearing plans so scan pruning /
  * pushdown / shuffle shape can be audited (and regression-checked) —
  * SURVEY.md §4's "what Catalyst gives us" claims, verified.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = GraftConfig()

    val base = java.nio.file.Files.createTempDirectory("plan_audit").toString
    val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = 50))
    TableIO.writeImages(gen.toDF().drop("true_cluster_id", "part_id"), s"$base/images", 4)
    val images = spark.read.parquet(s"$base/images")

    println("==== PLAN 1: featurize scan (bytes must be pruned) ====")
    MinHash.featurize(spark, images, cfg).toDF().explain("formatted")

    println("==== PLAN 2: partition-pruned read (part_id = 2 only) ====")
    images.where(col("part_id") === 2).select("image_id").explain("formatted")

    println("==== PLAN 3: fused banding + salted chaining (one wide shuffle) ====")
    val features = MinHash.featurize(spark, images, cfg).toDF()
    Banding.candidatePairs(features, cfg, 0).explain("formatted")

    println("==== PLAN 4: q1_agg (parquet pushdown + partial aggregation) ====")
    graft.SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    spark.stop()
  }
}
