package graft.lsh

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1 + V2 + V3 — candidate-pair verification (SURVEY.md §2.3).
  *
  * The reference merges a candidate pair when
  *   dice ≥ sd_high  OR  (dice ≥ sd_low AND levenshtein ≤ distance_threshold)
  * (`/root/reference/lsh_based_clustering.py:543-545,642-644`).
  *
  * Graft transposition for image+caption rows: the DNA strand's analog is the
  * caption, so the Dice test runs on CAPTION q-grams at the reference's
  * thresholds, while the image side contributes an independent confirmation:
  * `bit_count(phash_a XOR phash_b) ≤ hammingThreshold`. Both must hold — the
  * 57 pHash bit-n-grams are NOT independent evidence (one colliding pHash
  * shares all of them), so folding them into a single Dice would let a chance
  * pHash collision merge rows with unrelated captions (observed: precision
  * 0.75 on the planted corpus; 1.00 with the two-modality test).
  *
  * Two-phase plan shape (round-2 scale fix): at 8M+ rows the verification
  * join dominated round-0 scratch disk because every candidate pair shipped
  * two ~1 KB shingle arrays through the shuffle. Phase 1 joins the pair list
  * against an (row_id, phash) projection — an 8-BYTE payload — and applies
  * the hamming gate, which kills the vast majority of cross-group
  * candidates; only survivors join the captions, and the q-gram lists are
  * recomputed from the caption AT the verify site (codegen'd
  * transform/xxhash64 — same list-with-duplicates semantics as
  * Shingler.captionShingles, intersection cardinality identical modulo
  * 64-bit collisions). Shuffle payload per pair drops ~10×; the gram
  * recompute runs only on hamming survivors.
  *
  * V1 — Sorensen-Dice with the reference's exact semantics (`:231-242`):
  * SET intersection over LIST lengths — `array_intersect` deduplicates while
  * `size(a) + size(b)` keeps raw lengths; all codegen'd built-ins.
  * V2 — edit-distance rescue: built-in `levenshtein` on captions.
  * V3 — suffix-array longest-common-substring confirmation (north rule):
  * a UDF evaluated ONLY in the lazy CaseWhen branch for pairs in the Dice
  * gray zone that failed the cheaper Levenshtein rescue.
  */
object VerifyPairs {

  private val lcsUdf = udf((a: String, b: String) => SuffixLcs.lcs(a, b))

  /** Caption q-gram hash list, duplicates preserved (the reference's numset
    * list semantics, `:244-258`); whole-string hash when shorter than q. */
  private def gramList(cap: Column, q: Int): Column =
    when(length(cap) >= q,
      transform(sequence(lit(1), length(cap) - (q - 1)),
        i => xxhash64(cap.substr(i, lit(q)))))
      .otherwise(array(xxhash64(cap)))

  /** Join candidate pairs (a, b) with per-row features and keep verified
    * pairs. `features` needs (row_id, phash) — the hot cache; `captions`
    * needs (row_id, caption) — since round 5 a separate DISK_ONLY cache
    * (the caption column only pays its memory cost at the much smaller
    * hamming-survivor site, never in the per-pass hot scans). */
  def verify(
      pairs: DataFrame,
      features: DataFrame,
      captions: DataFrame,
      q: Int,
      sdHigh: Double,
      sdLow: Double,
      distanceThreshold: Int,
      hammingThreshold: Int,
      minLcs: Int): DataFrame = {

    // Phase 1 — hamming gate on an 8-byte payload.
    val pa = features.select(col("row_id").as("a"), col("phash").as("ph_a"))
    val pb = features.select(col("row_id").as("b"), col("phash").as("ph_b"))
    val hammingOk = pairs
      .join(pa, "a").join(pb, "b")
      .where(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= hammingThreshold)
      .select("a", "b")

    // Phase 2 — captions for survivors only; grams recomputed post-join.
    val fa = captions.select(col("row_id").as("a"), col("caption").as("cap_a"))
    val fb = captions.select(col("row_id").as("b"), col("caption").as("cap_b"))
    val joined = hammingOk.join(fa, "a").join(fb, "b")
      .withColumn("g_a", gramList(col("cap_a"), q))
      .withColumn("g_b", gramList(col("cap_b"), q))

    val dice = lit(2.0) * size(array_intersect(col("g_a"), col("g_b"))) /
      (size(col("g_a")) + size(col("g_b")))

    // Predicate order = cost order: Dice gates the expensive levenshtein /
    // suffix-LCS rescue (profiled round 1: −22% wall at 32 cores).
    joined
      .withColumn("dice", dice)
      .where(col("dice") >= sdLow)
      .where(
        col("dice") >= sdHigh ||
        when(levenshtein(col("cap_a"), col("cap_b")) <= distanceThreshold, lit(true))
          .otherwise(lcsUdf(col("cap_a"), col("cap_b")) >= minLcs))
      .select("a", "b")
  }
}
