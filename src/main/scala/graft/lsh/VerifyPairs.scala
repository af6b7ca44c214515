package graft.lsh

import org.apache.spark.sql.DataFrame
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

  /** Caption-domain grams: tag bit 62 is 0 (Shingler.CAPTION_TAG). */
  private def captionGrams(sh: org.apache.spark.sql.Column) =
    filter(sh, x => x.bitwiseAND(lit(1L << 62)) === 0L)

  /** Join candidate pairs (a, b) with per-row features and keep verified
    * pairs. `features` needs (row_id, caption, shingles, phash). */
  def verify(
      pairs: DataFrame,
      features: DataFrame,
      sdHigh: Double,
      sdLow: Double,
      distanceThreshold: Int,
      hammingThreshold: Int,
      minLcs: Int): DataFrame = {

    val fa = features.select(
      col("row_id").as("a"), col("caption").as("cap_a"),
      captionGrams(col("shingles")).as("sh_a"), col("phash").as("ph_a"))
    val fb = features.select(
      col("row_id").as("b"), col("caption").as("cap_b"),
      captionGrams(col("shingles")).as("sh_b"), col("phash").as("ph_b"))

    val joined = pairs.join(fa, "a").join(fb, "b")

    val dice = lit(2.0) * size(array_intersect(col("sh_a"), col("sh_b"))) /
      (size(col("sh_a")) + size(col("sh_b")))

    // Predicate order = cost order: the 2-op hamming test kills most
    // cross-group candidates before the ~300-op Dice set intersection
    // (profiled: verification dominates round-0 CPU); Dice gates the
    // expensive levenshtein / suffix-LCS rescue.
    joined
      .where(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= hammingThreshold)
      .withColumn("dice", dice)
      .where(col("dice") >= sdLow)
      .where(
        col("dice") >= sdHigh ||
        when(levenshtein(col("cap_a"), col("cap_b")) <= distanceThreshold, lit(true))
          .otherwise(lcsUdf(col("cap_a"), col("cap_b")) >= minLcs))
      .select("a", "b")
  }
}
