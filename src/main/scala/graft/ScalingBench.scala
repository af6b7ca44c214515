package graft

import org.apache.spark.sql.SparkSession

import graft.cluster.Pipeline
import graft.gen.SyntheticCorpus
import graft.model.GraftConfig

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors). No real cluster exists in this
  * sandbox, so — per the driver instruction — the same job runs at two
  * parallelism levels (default local[8] vs local[32]) on the SAME input;
  * efficiency = (T_low / T_high) / (cpusHigh / cpusLow).
  *
  * Corpus generation (javax.imageio encoding) is excluded from the timed
  * window: it is fixture cost, not pipeline cost.
  */
object ScalingBench {

  private def runOnce(cpus: Int, groups: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gen = SyntheticCorpus.generate(spark,
      SyntheticCorpus.GenConfig(groups = groups)).cache()
    val images = SyntheticCorpus.imagesOf(gen)
    val n = images.count()
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, images, GraftConfig(seed = 7L))
    res.assign.count()
    val sec = (System.nanoTime() - t0) / 1e9
    gen.unpersist()
    spark.stop()
    (n, sec)
  }

  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS_HI", "32").toInt
    val groups = sys.env.getOrElse("SPARK_GRAFT_BENCH_GROUPS", "3000").toInt
    // warm-up at high parallelism (JIT, codegen caches), not reported
    runOnce(hi, math.max(groups / 10, 100))
    val (n1, tLo) = runOnce(lo, groups)
    val (_, tHi) = runOnce(hi, groups)
    val speedup = tLo / tHi
    val eff = speedup / (hi.toDouble / lo)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","rows":$n1,"cpus_lo":$lo,"cpus_hi":$hi,"sec_lo":$tLo%.2f,"sec_hi":$tHi%.2f,"images_per_sec_lo":${n1 / tLo}%.1f,"images_per_sec_hi":${n1 / tHi}%.1f,"speedup":$speedup%.2f}""")
  }
}
