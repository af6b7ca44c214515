package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Hashing
import graft.feat.Shingler
import graft.lsh.SuffixLcs

class HashingSpec extends AnyFunSuite {
  test("mix64 is deterministic and avalanche-y") {
    assert(Hashing.mix64(42L) == Hashing.mix64(42L))
    assert(Hashing.mix64(42L) != Hashing.mix64(43L))
  }
  test("stringHash stable across calls and differs across strings") {
    assert(Hashing.stringHash("img-1-2") == Hashing.stringHash("img-1-2"))
    assert(Hashing.stringHash("img-1-2") != Hashing.stringHash("img-1-3"))
  }
  test("substringHash equals stringHash of the substring") {
    val s = "the quick brown fox"
    for (i <- 0 until s.length - 3)
      assert(Hashing.substringHash(s, i, 4) == Hashing.stringHash(s.substring(i, i + 4)))
  }
  test("sampleIndices returns k distinct in-range lanes, deterministic") {
    val a = Hashing.sampleIndices(7L, 40, 3)
    val b = Hashing.sampleIndices(7L, 40, 3)
    assert(a.toSeq == b.toSeq)
    assert(a.distinct.length == 3)
    assert(a.forall(i => i >= 0 && i < 40))
    // different seeds give different subsets at least sometimes
    val c = (0 until 50).map(s => Hashing.sampleIndices(s.toLong, 40, 3).toSeq).distinct
    assert(c.size > 30)
  }
}

class ShinglerSpec extends AnyFunSuite {
  test("caption shingle count is len - q + 1 (list semantics, ref :244-258)") {
    val sh = Shingler.captionShingles("abcdefgh", 6)
    assert(sh.length == 3)
  }
  test("equal strings yield identical shingles; edits change few") {
    val a = Shingler.captionShingles("the quick brown fox jumps over the dog", 6)
    val b = Shingler.captionShingles("the quick brown fox jumps over the dog", 6)
    assert(a.toSeq == b.toSeq)
    val c = Shingler.captionShingles("the quick brewn fox jumps over the dog", 6)
    val shared = a.toSet.intersect(c.toSet).size
    assert(shared >= a.length - 7) // one substitution kills ≤ q grams
  }
  test("phash shingles: flipping b bits kills ≤ 8b windows") {
    val p1 = 0x0123456789ABCDEFL
    val p2 = p1 ^ (1L << 20) ^ (1L << 45)
    val a = Shingler.phashShingles(p1).toSet
    val b = Shingler.phashShingles(p2).toSet
    assert(a.intersect(b).size >= 57 - 16)
  }
  test("sorensenDice exact list-length semantics (ref :231-242)") {
    // reference: 2*|set∩set| / (len list1 + len list2)
    val a = Array(1L, 1L, 2L, 3L) // set {1,2,3}, len 4
    val b = Array(1L, 2L, 2L, 2L, 9L) // set {1,2,9}, len 5
    // intersection {1,2} = 2 → 2*2/(4+5)
    assert(math.abs(Shingler.sorensenDice(a, b) - 4.0 / 9.0) < 1e-12)
    assert(Shingler.sorensenDice(Array.empty[Long], Array.empty[Long]) == 0.0)
  }
}

class SuffixLcsSpec extends AnyFunSuite {
  private def bruteLcs(a: String, b: String): Int = {
    var best = 0
    for (i <- 0 until a.length; j <- 0 until b.length) {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      if (k > best) best = k
    }
    best
  }
  test("lcs matches brute force on fixed cases") {
    assert(SuffixLcs.lcs("banana", "ananas") == 5)
    assert(SuffixLcs.lcs("abc", "xyz") == 0)
    assert(SuffixLcs.lcs("", "xyz") == 0)
    assert(SuffixLcs.lcs("same string", "same string") == 11)
  }
  test("lcs matches brute force on random strings (seeded property loop)") {
    val rnd = new java.util.Random(42)
    val alphabet = "abcab "
    def randStr(): String = {
      val n = rnd.nextInt(41)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.append(alphabet.charAt(rnd.nextInt(alphabet.length))))
      sb.toString
    }
    for (_ <- 0 until 300) {
      val a = randStr(); val b = randStr()
      assert(SuffixLcs.lcs(a, b) == bruteLcs(a, b), s"a='$a' b='$b'")
    }
  }
}

class MinHashSpec extends AnyFunSuite {
  import graft.feat.MinHash
  import graft.model.GraftConfig
  test("identical shingle sets give identical signatures") {
    val cfg = GraftConfig()
    val seeds = MinHash.laneSeeds(cfg)
    val sh = Array(1L, 5L, 9L, 42L)
    assert(MinHash.signature(sh, seeds).toSeq == MinHash.signature(sh.reverse, seeds).toSeq)
  }
  test("signature lane equality rate approximates Jaccard") {
    val cfg = GraftConfig(m = 400) // more lanes → tighter estimate
    val seeds = MinHash.laneSeeds(cfg)
    val a = (0L until 100L).map(Hashing.mix64).toArray
    val b = (50L until 150L).map(Hashing.mix64).toArray // Jaccard = 50/150 = 1/3
    val sa = MinHash.signature(a, seeds)
    val sb = MinHash.signature(b, seeds)
    val eq = sa.zip(sb).count { case (x, y) => x == y }.toDouble / cfg.m
    assert(math.abs(eq - 1.0 / 3.0) < 0.08, s"got $eq")
  }
  test("simhash of near-identical sets has small hamming distance") {
    val a = (0L until 200L).map(Hashing.mix64).toArray
    val b = (0L until 200L).map(Hashing.mix64).toArray.updated(3, 999L).updated(77, 123L)
    val d = java.lang.Long.bitCount(MinHash.simhash(a) ^ MinHash.simhash(b))
    assert(d <= 12, s"hamming $d")
    val c = (1000L until 1200L).map(Hashing.mix64).toArray
    val d2 = java.lang.Long.bitCount(MinHash.simhash(a) ^ MinHash.simhash(c))
    assert(d2 >= 15, s"unrelated hamming $d2")
  }
}
