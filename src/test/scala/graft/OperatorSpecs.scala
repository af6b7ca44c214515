package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.DocDedup
import graft.eval.Metrics
import graft.model.GraftConfig

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  // truth: A=[1,2,3,4] B=[5,6] C=[7,8]; pred: p1=[1,2,3] p2=[4,5,6] p3=[7] p4=[8]
  private lazy val pred = Seq(
    (1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 20L),
    (7L, 30L), (8L, 40L)).toDF("row_id", "cluster_id")
  private lazy val truth = Seq(
    (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, 200L), (6L, 200L),
    (7L, 300L), (8L, 300L)).toDF("row_id", "true_cluster_id")

  test("metrics match hand-computed reference semantics") {
    val r = Metrics.evaluate(spark, pred, truth)
    assert(r.n == 8 && r.clusters == 4 && r.singles == 2)
    // M6 pair counting
    assert(math.abs(r.dupPairRecall - 0.5) < 1e-12)
    assert(math.abs(r.dupPairPrecision - 2.0 / 3.0) < 1e-12)
    // M3/M4 vs analytic values (arithmetic-mean NMI, ARI closed form)
    assert(math.abs(r.nmi - 0.6980018101) < 1e-9, s"nmi ${r.nmi}")
    assert(math.abs(r.adjustedRand - 0.4324324324) < 1e-9, s"ari ${r.adjustedRand}")
    // M5 purity: (3 + 2 + 1 + 1) / 8
    assert(math.abs(r.purity - 7.0 / 8.0) < 1e-12)
    // M2 per reference anchor semantics (:870-896)
    assert(r.falsePositives == 2 && r.trueNegatives == 6)
    assert(r.falseNegatives == 2 && r.truePositives == 6)
    assert(math.abs(r.csi - 0.6) < 1e-12)
    // M1: only p1 passes (pure, <= truth size, covers 3/4) for gamma <= 0.75
    assert(math.abs(r.gammaAccuracy(0.6) - 0.25) < 1e-12)
    assert(math.abs(r.gammaAccuracy(0.7) - 0.25) < 1e-12)
    assert(r.gammaAccuracy(0.8) == 0.0 && r.gammaAccuracy(1.0) == 0.0)
  }

  test("perfect clustering scores 1.0 everywhere") {
    val p = truth.select(col("row_id"), col("true_cluster_id").as("cluster_id"))
    val r = Metrics.evaluate(spark, p, truth)
    assert(r.nmi == 1.0 || math.abs(r.nmi - 1.0) < 1e-12)
    assert(math.abs(r.adjustedRand - 1.0) < 1e-12)
    assert(r.dupPairRecall == 1.0 && r.dupPairPrecision == 1.0)
    assert(r.falsePositives == 0 && r.falseNegatives == 0)
    assert(Metrics.GAMMAS.forall(g => r.gammaAccuracy(g) == 1.0))
  }
}

class DocDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docsDf = Seq(
    // near-dup group 1 (small edits)
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank todey"),
    (3L, "the quick brown fox jumped over the lazy dog near the river bank today"),
    // near-dup group 2
    (4L, "spark shuffles data between executors during wide transformations always"),
    (5L, "spark shuffles data between executors during wide transformation always"),
    // distinct singletons
    (6L, "completely unrelated text about cooking pasta with tomato sauce basil"),
    (7L, "astronomy telescopes capture distant galaxies through long exposures nightly")
  ).toDF("doc_id", "text")

  test("minhashLsh clusters planted near-dups and keeps singletons apart") {
    val out = DocDedup.minhashLsh(spark, docsDf,
      GraftConfig(q = 4, bandRounds = 24, k = 3, m = 40), jaccardThreshold = 0.6)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L), s"group1 split: $out")
    assert(out(4L) == out(5L), s"group2 split: $out")
    assert(Set(out(1L), out(4L), out(6L), out(7L)).size == 4, s"false merge: $out")
  }

  test("simhash groups near-identical token sets") {
    val out = DocDedup.simhash(spark, docsDf, hammingMax = 6)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L), s"$out")
    assert(out(1L) != out(6L) && out(1L) != out(7L) && out(6L) != out(7L), s"$out")
  }

  test("exact dedup canonicalizes identical keys to min doc_id") {
    val d = Seq((5L, "xx"), (9L, "xx"), (2L, "yy")).toDF("doc_id", "text")
    val out = DocDedup.exact(d, col("text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((5L, 5L, 2L), (9L, 5L, 2L), (2L, 2L, 1L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("LSH ANN recall@5 >= 0.8 vs brute force on sf0.001 embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, e, 5, 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(spark, q, e, 5, 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"ANN recall $recall")
  }

  test("cosine is exact: identical vector scores 1.0 at rank 1") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dup = e.where(col("vec_id") === 3)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.unionByName(dup)
    val top = Similarity.bruteForceTopK(e.where(col("vec_id") === 3), corpus, 1, 64)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    assert(top.head._1 == 1003L && top.head._2 == 1.0, top.mkString(","))
  }
}
