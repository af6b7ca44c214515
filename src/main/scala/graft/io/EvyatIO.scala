package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — reader for the reference's NATIVE input format, `evyat.txt`
  * (`/root/reference/lsh_based_clustering.py:155-208`, format documented in
  * its README.md:8-32):
  *
  * {{{
  *   <original data string #1>
  *   *****************************
  *   <erroneous copies of the above string>
  *   <blank>
  *   <blank>
  *   <original data string #2>
  *   ...
  * }}}
  *
  * Parsing semantics mirror the reference exactly: the line immediately
  * BEFORE a `*` separator is the cluster's original strand (a rep, never a
  * read — the reference appends it then pops it at `:169-171`); the
  * non-blank lines AFTER the separator, up to the next original, are the
  * noisy reads the engine clusters (`all_reads`, `:181-187`); the original
  * strands and the read→original mapping exist for accuracy computation
  * only (`:157-158`).
  *
  * Scale shape: lines are read distributed (`textFile` + `zipWithIndex` for
  * stable file-order line numbers — the one genuinely order-dependent input
  * format in the system, so an RDD pass is warranted per SURVEY §2.10);
  * only the separator line-number array is collected (one Long per cluster)
  * and broadcast, and each line resolves its cluster by binary search —
  * no per-line shuffle, no driver materialization of strands.
  */
object EvyatIO {

  /** Parse an evyat file.
    * @return (reads, reps):
    *   reads(read_id, strand, true_cluster_id) — the noisy copies, in the
    *     engine's input universe; read_id is the (stable) line number;
    *   reps(cluster_id, rep) — the original strands (metric/export parity).
    */
  def readEvyat(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val lines = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .map { case (l, i) => (i, l.trim) } // the reference strips every line (:166)

    val seps = lines
      .filter(t => t._2.nonEmpty && t._2.charAt(0) == '*')
      .map(_._1).collect().sorted
    val bc = spark.sparkContext.broadcast(seps)

    val tagged = lines
      .filter(t => t._2.nonEmpty && t._2.charAt(0) != '*')
      .map { case (idx, s) =>
        val sp = bc.value
        // lo = number of separators before this line
        var lo = 0; var hi = sp.length
        while (lo < hi) { val m = (lo + hi) >>> 1; if (sp(m) < idx) lo = m + 1 else hi = m }
        val isRep = lo < sp.length && sp(lo) == idx + 1
        (idx, s, if (isRep) lo.toLong else lo.toLong - 1L, isRep)
      }
      .toDF("read_id", "strand", "true_cluster_id", "is_rep")

    val reads = tagged
      .where(!col("is_rep") && col("true_cluster_id") >= 0)
      .select("read_id", "strand", "true_cluster_id")
    val reps = tagged
      .where(col("is_rep"))
      .select(col("true_cluster_id").as("cluster_id"), col("strand").as("rep"))
    (reads, reps)
  }

  /** Wrap evyat reads in the pipeline's input-table shape: the strand is the
    * caption; the image modality is absent (run with
    * `GraftConfig(usePhash = false, anchorAlphabet = "ACGT")`). */
  def asImages(reads: DataFrame): DataFrame =
    reads.select(
      concat(lit("read-"), col("read_id").cast("string")).as("image_id"),
      typedLit(Array.empty[Byte]).as("bytes"),
      lit(0).as("w"), lit(0).as("h"), lit("txt").as("fmt"),
      col("strand").as("caption"),
      lit(0L).as("phash"))

  /** Metric-shape ground truth for a parsed evyat corpus. */
  def truthOf(reads: DataFrame): DataFrame =
    reads.select(
      graft.feat.RowIds.rowIdCol(concat(lit("read-"), col("read_id").cast("string"))).as("row_id"),
      concat(lit("read-"), col("read_id").cast("string")).as("image_id"),
      col("true_cluster_id"))
}
