package graft.lsh

/** V3 — suffix-array longest-common-substring (graft-only operator required
  * by the north rule: "suffix-array substring pass for exact long-match
  * confirmation on candidate pairs"; SURVEY.md §2.3 V3, motivated by the
  * reference's common-substring signatures,
  * `/root/reference/lsh_based_clustering.py:455-462,545`).
  *
  * Classic construction: concatenate a + SEP + b, build the suffix array by
  * prefix doubling (O(n log² n)), compute LCP via Kasai's algorithm (O(n)),
  * and take the max LCP between adjacent suffixes originating in different
  * strings. Applied only to the (small) banded candidate set, never all
  * pairs.
  */
object SuffixLcs {

  /** Suffix array by prefix doubling. */
  def suffixArray(s: String): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var tmp = new Array[Int](n)
    val sa = Array.tabulate(n)(identity)
    var i = 0
    while (i < n) { rank(i) = s.charAt(i).toInt; i += 1 }
    var kLen = 1
    while (kLen < n) {
      val k = kLen
      def key(x: Int): (Int, Int) = (rank(x), if (x + k < n) rank(x + k) else -1)
      val ord = Ordering.Tuple2(Ordering.Int, Ordering.Int)
      // sort indices by (rank, rank+k)
      val idx = sa.sortBy(key)(ord)
      System.arraycopy(idx, 0, sa, 0, n)
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (key(sa(i)) == key(sa(i - 1))) 0 else 1)
        i += 1
      }
      val t = rank; rank = tmp; tmp = t
      if (rank(sa(n - 1)) == n - 1) kLen = n // all distinct — done
      else kLen <<= 1
    }
    sa
  }

  /** Kasai LCP: lcp(i) = LCP(sa(i), sa(i+1)). */
  def kasaiLcp(s: String, sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](math.max(0, n - 1))
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) + 1 < n) {
        val j = sa(rank(i) + 1)
        while (i + h < n && j + h < n && s.charAt(i + h) == s.charAt(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Length of the longest common substring of a and b. */
  def lcs(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val s = a + '\u0001' + b
    val sa = suffixArray(s)
    val lcp = kasaiLcp(s, sa)
    val cut = a.length // index of SEP; suffixes < cut are from a
    var best = 0
    var i = 0
    while (i < lcp.length) {
      val x = sa(i); val y = sa(i + 1)
      if ((x < cut) != (y < cut)) {
        // Clamp at the separator so a match is never counted across it
        // (defensive: U+0001 should never occur in captions anyway).
        val eff = math.min(lcp(i), cut - math.min(x, y))
        if (eff > best) best = eff
      }
      i += 1
    }
    best
  }
}
