package graft.util

/** Deterministic 64-bit hashing / splittable seeding used across the pipeline.
  *
  * The reference relies on unseeded `random.shuffle` / `random.sample`
  * everywhere (`/root/reference/lsh_based_clustering.py:187,279,374,535,633`),
  * which makes two runs differ. We replace every random draw with a
  * splittable, seeded hash so the whole pipeline is reproducible and
  * partition-order independent (SURVEY.md §5.3).
  *
  * mix64 is the SplitMix64 finalizer (public domain, Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14) — the same
  * mixing used by `java.util.SplittableRandom`.
  */
object Hashing {
  final val GOLDEN: Long = 0x9E3779B97F4A7C15L

  /** SplitMix64 finalizer: high-quality 64-bit avalanche mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Combine two 64-bit values into one hash. */
  @inline def hash2(a: Long, b: Long): Long = mix64(mix64(a) ^ b)

  /** Combine three 64-bit values. */
  @inline def hash3(a: Long, b: Long, c: Long): Long = mix64(hash2(a, b) ^ c)

  /** FNV-1a 64-bit over a string's UTF-16 code units, finalized by mix64.
    * Used for stable row ids (`row_id = stringHash(image_id)`) — derivation
    * is order-independent, unlike `monotonically_increasing_id` (SURVEY §1.1).
    */
  def stringHash(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  /** Hash of a substring [from, from+len) without allocation — used by the
    * q-gram shingler on the hot path. */
  def substringHash(s: String, from: Int, len: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  /** Deterministic "uniform int in [0, n)" from a seed — replaces
    * `random.sample` / `random.choice` in the reference. */
  @inline def boundedInt(seed: Long, n: Int): Int = {
    val h = mix64(seed)
    (((h >>> 1) % n).toInt + n) % n
  }

  /** k distinct indices out of [0, m) — a seeded Fisher-Yates prefix;
    * replaces `random.sample(range(m), k)`
    * (`/root/reference/lsh_based_clustering.py:535,633`). */
  def sampleIndices(seed: Long, m: Int, k: Int): Array[Int] = {
    val arr = Array.tabulate(m)(identity)
    var i = 0
    while (i < k) {
      val j = i + boundedInt(hash2(seed, i.toLong), m - i)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i += 1
    }
    java.util.Arrays.copyOfRange(arr, 0, k)
  }
}
