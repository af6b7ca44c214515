package graft

import org.apache.spark.sql.SparkSession

import graft.cluster.Pipeline
import graft.gen.SyntheticCorpus
import graft.io.TableIO
import graft.model.GraftConfig

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors). No real cluster exists in this
  * sandbox, so — per the driver instruction — the same job runs at two
  * parallelism levels (default local[8] vs local[32]) on the SAME input and
  * we report throughput at both; efficiency = (T_lo / T_hi) / (hi / lo).
  *
  * Methodology notes (these mirror what a real N vs 4N cluster run holds
  * constant):
  *  - the corpus is GENERATED ONCE to partitioned parquet and both runs read
  *    the same files — fixture cost excluded, input bytes identical;
  *  - `spark.sql.shuffle.partitions` is fixed (64) for both runs, as a
  *    cluster config would be — only the executor-thread count varies;
  *  - AQE partition coalescing is disabled so the scheduler cannot shrink
  *    the task count below the high-parallelism level at this (small)
  *    evidence scale; skew-join splitting stays on.
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def timedRun(cpus: Int, imagesPath: String, warm: Boolean): (Long, Double) = {
    val spark = session(cpus)
    val images = spark.read.parquet(imagesPath)
    if (warm) { // tiny warm-up: JIT + codegen caches, not reported
      Pipeline.run(spark, images.limit(2000), GraftConfig(seed = 7L)).assign.count()
    }
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, images, GraftConfig(seed = 7L))
    val n = res.assign.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (n, sec)
  }

  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS_HI", "32").toInt
    val groups = sys.env.getOrElse("SPARK_GRAFT_BENCH_GROUPS", "8000").toInt
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_PATH",
      s"/tmp/graft_scaling_corpus_g$groups")

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS_MARKER"))) {
      val spark = session(hi)
      val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = groups))
      TableIO.writeImages(SyntheticCorpus.imagesOf(gen), path, numParts = 64)
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$path/_SUCCESS_MARKER"))
      spark.stop()
    }

    val (n1, tHiWarm) = timedRun(hi, path, warm = true)
    val (_, tLo) = timedRun(lo, path, warm = false)
    val (_, tHi) = timedRun(hi, path, warm = false)
    val speedup = tLo / tHi
    val eff = speedup / (hi.toDouble / lo)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","rows":$n1,"cpus_lo":$lo,"cpus_hi":$hi,"sec_lo":$tLo%.2f,"sec_hi":$tHi%.2f,"sec_hi_warm":$tHiWarm%.2f,"images_per_sec_lo":${n1 / tLo}%.1f,"images_per_sec_hi":${n1 / tHi}%.1f,"speedup":$speedup%.2f}""")
  }
}
