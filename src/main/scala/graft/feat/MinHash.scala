package graft.feat

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{FeatureRow, GraftConfig}
import graft.util.Hashing._

/** P2 — batched MinHash signatures + SimHash sketch (SURVEY.md §2.2 P2).
  *
  * The reference materializes m explicit permutations of {0..4^q-1}
  * (`/root/reference/lsh_based_clustering.py:277-286`) — viable only at a
  * 4096-element domain. At a 2^64 shingle domain we use the standard
  * universal-hash MinHash family: h_i(x) = mix64(seed_i ^ x), seeded
  * deterministically per lane — identical collision semantics
  * (P[sig_i(A)=sig_i(B)] ≈ Jaccard(A,B)), nothing to broadcast but m seeds.
  *
  * Everything is computed in ONE typed mapPartitions pass over the input
  * (per input_hint: typed Dataset, no RDD), emitting shingles + m-lane
  * signature + SimHash per row; Spark's native parallelism replaces the
  * reference's multiprocessing queues (`:289-397`).
  */
object MinHash {

  private final val MINHASH_DOMAIN = 0x4D494E48L // "MINH"

  def laneSeeds(cfg: GraftConfig): Array[Long] =
    Array.tabulate(cfg.m)(i => hash3(cfg.seed, MINHASH_DOMAIN, i.toLong))

  /** MinHash signature over a shingle array. */
  def signature(shingles: Array[Long], seeds: Array[Long]): Array[Long] = {
    val m = seeds.length
    val sig = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val x = shingles(i)
      var j = 0
      while (j < m) {
        val h = mix64(seeds(j) ^ x)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash: weighted bit vote over mixed shingle hashes. */
  def simhash(shingles: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < shingles.length) {
      val h = mix64(shingles(i) ^ 0x53494D48L) // "SIMH" domain
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Featurize the input table: one mapPartitions pass producing FeatureRow.
    * Only (image_id, caption, phash) are read — Catalyst prunes `bytes` out
    * of the parquet scan, which dominates I/O otherwise (SURVEY.md §4). */
  def featurize(spark: SparkSession, images: DataFrame, cfg: GraftConfig): Dataset[FeatureRow] = {
    import spark.implicits._
    val q = cfg.q
    val seeds = laneSeeds(cfg)
    val usePhash = cfg.usePhash
    images
      .select("image_id", "caption", "phash")
      .as[(String, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, caption, phash) =>
          val sh =
            if (usePhash) Shingler.shingles(caption, phash, q)
            else Shingler.captionShingles(caption, q)
          FeatureRow(RowIds.rowId(id), caption, sh, signature(sh, seeds), simhash(sh), phash)
        }
      }
  }
}
