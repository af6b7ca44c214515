package graft.feat

import graft.util.Hashing._

/** P1 — q-gram "number set" extraction (SURVEY.md §2.2 P1).
  *
  * The reference encodes each DNA q-gram as a base-4 integer
  * (`/root/reference/lsh_based_clustering.py:244-258`), emitting an ORDERED
  * LIST WITH DUPLICATES of length `len - q + 1`. Length preservation matters:
  * Sorensen-Dice divides by list lengths, not set sizes (`:242`).
  *
  * Graft transposition: caption q-grams are hashed to 64-bit codes (the base-4
  * encoding does not generalize beyond a 4-letter alphabet; a seeded hash has
  * the same collision semantics at web scale), and the image side contributes
  * pHash bit n-grams — every 8-bit window of the 64-bit perceptual hash,
  * position-tagged. The two domains are disjoint via a tag in the high bits so
  * caption grams never collide with phash grams.
  */
object Shingler {
  private val CAPTION_TAG = 0L
  private val PHASH_TAG = 1L << 62

  /** Caption q-grams: one 63-bit hash per window, caption domain tag. */
  def captionShingles(caption: String, q: Int): Array[Long] = {
    val n = caption.length - q + 1
    if (n <= 0) return Array(substringHash(caption, 0, caption.length) & ~(3L << 62) | CAPTION_TAG)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = (substringHash(caption, i, q) & ~(3L << 62)) | CAPTION_TAG
      i += 1
    }
    out
  }

  /** pHash bit n-grams: all 8-bit windows of the 64-bit hash, tagged with
    * window position (57 grams). A b-bit flip in the phash kills ≤ 8 windows,
    * so near-identical images share most grams. */
  def phashShingles(phash: Long, window: Int = 8): Array[Long] = {
    val n = 64 - window + 1
    val mask = (1L << window) - 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bits = (phash >>> i) & mask
      out(i) = (mix64(bits * 64 + i) & ~(3L << 62)) | PHASH_TAG
      i += 1
    }
    out
  }

  /** Combined feature array (duplicates preserved, caption grams first). */
  def shingles(caption: String, phash: Long, q: Int): Array[Long] = {
    val c = captionShingles(caption, q)
    val p = phashShingles(phash)
    val out = new Array[Long](c.length + p.length)
    System.arraycopy(c, 0, out, 0, c.length)
    System.arraycopy(p, 0, out, c.length, p.length)
    out
  }

  /** Exact Sorensen-Dice with the reference's list-length denominator
    * (`lsh_based_clustering.py:231-242`): 2·|set(a) ∩ set(b)| / (|a| + |b|). */
  def sorensenDice(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = new java.util.HashSet[Long](a.length * 2)
    var i = 0
    while (i < a.length) { sa.add(a(i)); i += 1 }
    val seen = new java.util.HashSet[Long](b.length * 2)
    var inter = 0
    i = 0
    while (i < b.length) {
      val x = b(i)
      if (sa.contains(x) && seen.add(x)) inter += 1
      i += 1
    }
    2.0 * inter / (a.length + b.length)
  }
}
