package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.feat.MinHash
import graft.lsh.{Banding, VerifyPairs}
import graft.model.GraftConfig

/** End-to-end near-duplicate clustering pipeline (SURVEY.md §3, §7).
  *
  * Phase structure mirrors the reference's `run()`
  * (`/root/reference/lsh_based_clustering.py:697-711`):
  *   1. featurize       (pre_step :120-152)      — one mapPartitions pass
  *   2. chunk phase     (chunk_partitioning :441) — fused substring rounds
  *   3. LSH banding     (clustering_in_chunks :550) — fused L rounds, global
  *   4. final clustering (final_clustering :567)  — macro rounds over the
  *      focus set (singles + per-cluster score reps), fresh lane subsets
  *      each macro round, until the work rate collapses (C5/C6).
  *
  * Where the reference loops hundreds of sequential micro-rounds, we fuse
  * every feedback-free group of rounds into ONE Spark job (banding is a
  * monotone OR-construction — SURVEY.md §7.3), keeping the driver loop only
  * where the reference genuinely feeds back state (focus-set refresh).
  */
object Pipeline {

  final case class PhaseStat(
      phase: String,
      macroRound: Int,
      candidatePairs: Long,
      verifiedPairs: Long,
      clusters: Long,
      singles: Long,
      workRate: Double,
      seconds: Double = 0.0)

  final case class Result(
      assign: DataFrame, // (row_id, cluster_id)
      scores: DataFrame, // (row_id, score) — A6
      features: DataFrame,
      stats: Seq[PhaseStat])

  private def clusterStats(assign: DataFrame): (Long, Long) = {
    val r = assign.groupBy("cluster_id").count()
      .agg(count(lit(1)), sum(when(col("count") === 1, 1L).otherwise(0L))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** A6 — score accumulation: +1 per verified-pair endpoint (`:546-547`). */
  private def endpointCounts(verified: DataFrame): DataFrame =
    verified.select(explode(array(col("a"), col("b"))).as("row_id"))
      .groupBy("row_id").agg(count(lit(1)).as("score"))

  /** Mutable-between-rounds pipeline state (assign + scores). */
  final case class State(assign: DataFrame, scores: DataFrame)

  /** C6 — adaptive round control (reference `:123-125,602,649-657`), scaled
    * to fused macro rounds (1 macro round = L micro rounds):
    *   micro budget   = max(⌈n^(1/2.2)⌉, 300)           (`:602`, min_rounds)
    *   work_in_bad    = ⌈n^(1/5)⌉ singles per micro      (`:125`)
    *   allowed_bad    = clamp(⌈1e7/n⌉, 4, 1000) micros   (`:123`)
    * A macro round is "bad" when it resolves ≤ L·work_in_bad singles; the
    * run stops once ⌈allowed_bad/L⌉ consecutive bad macro rounds have
    * occurred AND ⌈300/L⌉ macro rounds have run (the reference's min_rounds
    * gate — on small inputs bad rounds are cheap, so the budget is patient).
    * Documented divergence: singles == 0 stops immediately; the reference
    * idles to min_rounds because its micro round is nearly free, whereas a
    * Spark macro round carries fixed job overhead and with no singles the
    * focus holds only cluster reps, which the completed rounds' L fresh lane
    * subsets each already sampled.
    *
    * `cfg.maxMacroRounds > 0` is an explicit override (tests, bounded runs):
    * fixed budget + the work-rate stop, round-1 behavior. */
  final case class RoundControl(cfg: GraftConfig, n: Long) {
    private val l = cfg.bandRounds
    val maxMacro: Int =
      if (cfg.maxMacroRounds > 0) cfg.maxMacroRounds
      else math.ceil(math.max(math.ceil(math.pow(n.toDouble, 1.0 / 2.2)), 300.0) / l).toInt
    val workInBadMacro: Long = l * math.ceil(math.pow(n.toDouble, 0.2)).toLong
    val allowedBadMacro: Int =
      math.max(1, math.ceil(math.min(math.max(1e7 / n.toDouble, 4.0), 1000.0) / l).toInt)
    val minMacro: Int = math.ceil(300.0 / l).toInt

    /** Fold one finished round into the control state.
      * Returns (new bad-round count, stop?). */
    def step(bad: Int, macroItr: Int, prevSingles: Long, stat: PhaseStat): (Int, Boolean) =
      if (cfg.maxMacroRounds > 0) (0, stat.workRate < cfg.minWorkRate)
      else {
        val diff = prevSingles - stat.singles
        val nbad = if (diff <= workInBadMacro) bad + 1 else 0
        (nbad, nbad >= allowedBadMacro && macroItr >= minMacro)
      }
  }

  /** Exact-duplicate collapse (round-2 scale fix). Web-scale corpora are
    * duplicate-heavy, and every exact-duplicate row multiplies the L×n
    * explode, the candidate set and the verification join for no
    * information: rows sharing (caption, phash) are instead linked by
    * salted identity chains — pairs that verify trivially (Dice 1, lev 0,
    * hamming 0) — and only the min-row_id representative of each identity
    * class enters candidate generation/verification. CC over
    * identity ∪ verified edges restores full connectivity, so the output
    * clustering is IDENTICAL to running on all rows (the reference merges
    * identical strings through the same sort-adjacency chaining, `:639-641`;
    * this hoists those merges out of the hot path). Exact string keys in
    * the window — no hash, no collision risk.
    *
    * Returns (identity edges, representative row ids, duplicate count). */
  private def collapseExactDups(features: DataFrame, saltShards: Int)
      : (DataFrame, DataFrame, Long) = {
    val salted = features.select(col("row_id"), col("caption"), col("phash"))
      .withColumn("salt", pmod(xxhash64(col("row_id")), lit(saltShards)))
    val wShard = Window.partitionBy("caption", "phash", "salt").orderBy("row_id")
    val intra = salted
      .select(col("row_id").as("y"), lag("row_id", 1).over(wShard).as("x"))
      .where(col("x").isNotNull)
    val shardMins = salted.groupBy("caption", "phash", "salt")
      .agg(min("row_id").as("mn")) // map-side partial agg: tiny shuffle
    val wInter = Window.partitionBy("caption", "phash").orderBy("salt", "mn")
    val inter = shardMins
      .withColumn("x", lag("mn", 1).over(wInter))
      .where(col("x").isNotNull)
      .select(col("x"), col("mn").as("y"))
    val identity = intra.select("x", "y").unionAll(inter)
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
    val repIds = shardMins.groupBy("caption", "phash")
      .agg(min("mn").as("row_id")).select("row_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDup = identity.count() // = n - |reps|; also materializes shard mins
    (identity, repIds, nDup)
  }

  /** Phases 2+3: chunk rounds + global banding + first CC pass. */
  def initialState(spark: SparkSession, features: DataFrame, cfg: GraftConfig,
                   n: Long, capLen: Int): (State, PhaseStat) = {
    val rows = features.select("row_id")

    val (identityEdges, repIds, nDup) = collapseExactDups(features, cfg.saltShards)
    // dup-free corpora skip the rep join entirely; otherwise the rep-id set
    // (one Long per distinct row) is broadcast when it fits, so the feature
    // relation is filtered without a shuffle
    val repFeatures =
      if (nDup == 0) features
      else if (n - nDup <= 20000000L) features.join(broadcast(repIds), "row_id")
      else features.join(repIds, "row_id")

    // 2+3. Chunk-phase substring rounds AND global LSH banding contribute
    // candidates; the union is verified ONCE at the final thresholds
    // (:569-570). The reference verifies chunk-phase pairs at the stricter
    // 0.32/0.28 (:522), so any pair it accepts there is also accepted here —
    // fusing the two verify passes is monotone (recall-safe) and halves the
    // feature-join shuffles. Round-2: both candidate FAMILIES are fused
    // into ONE posexplode + chaining pass as well (band positions 0..L-1
    // are LSH rounds, L..L+chunkRounds-1 the substring rounds), so round 0
    // plans a single wide exchange + a single pair-distinct for everything.
    val allHashes = Banding.bandHashArray(col("minhash"), Banding.lanes(cfg, 0)) +:
      ChunkPhase.hashCols(cfg, n, capLen)
    val buckets = repFeatures.select(
      col("row_id"),
      posexplode(concat(allHashes.head, array(allHashes.tail: _*)))
        .as(Seq("band", "band_hash")))
    val cand = Banding.chainPairs(buckets, cfg.saltShards)
    val firstEdges = VerifyPairs.verify(
      cand, features, cfg.q, cfg.sdHigh, cfg.sdLow,
      cfg.distanceThreshold, cfg.hammingThreshold, cfg.minLcs)
      .unionAll(identityEdges)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nVerified = firstEdges.count()
    val comps = ConnectedComponents.components(spark, firstEdges)
    val assign = ConnectedComponents.assign(rows, comps).localCheckpoint(false)
    // scores checkpoint is EAGER: it must materialize while firstEdges is
    // still cached — lazily it would recompute the whole verify pass on
    // first use in macro round 1 (round-1 inefficiency).
    val scores = endpointCounts(firstEdges).localCheckpoint()
    val (clusters, singles) = clusterStats(assign) // materializes assign
    firstEdges.unpersist()
    repIds.unpersist()
    graft.util.Checkpoints.unpersistCheckpoint(comps) // assign supersedes it
    (State(assign, scores),
      PhaseStat("chunk+band", 0, -1L, nVerified, clusters, singles, 1.0))
  }

  /** Phase 4, one macro round: focus set -> fused banding -> verify ->
    * incremental CC. Returns the new state and this round's stat. */
  def macroStep(spark: SparkSession, features: DataFrame, st: State,
                cfg: GraftConfig, macroItr: Int, prevSingles: Long): (State, PhaseStat) = {
    val rows = features.select("row_id")
    // Focus = all singles + the rank-r rep of every multi cluster, the
    // reference's cycling r (`:623-628`), r = (macro-1) % reps_per_cluster.
    val r = (macroItr - 1) % cfg.repsPerCluster
    val sizes = st.assign.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
    val withSz = st.assign.join(sizes, "cluster_id")
    val singlesDf = withSz.where(col("sz") === 1).select("row_id")
    val scored = withSz.where(col("sz") > 1)
      .join(st.scores, Seq("row_id"), "left")
      .na.fill(0L, Seq("score"))
    val wRank = Window.partitionBy("cluster_id")
      .orderBy(col("score").desc, col("row_id"))
    val reps = scored.withColumn("rk", row_number().over(wRank))
      .where(col("rk") === r + 1).select("row_id")
    val focus = singlesDf.unionAll(reps)

    // persisted: chainPairs scans its input twice (intra window + shard-min
    // aggregate) and this join is the expensive branch of that input
    val focusFeatures = features.join(focus, "row_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = Banding.candidatePairs(focusFeatures, cfg, macroRound = macroItr)
    val verified = VerifyPairs.verify(
      cand, features, cfg.q, cfg.sdHigh, cfg.sdLow,
      cfg.distanceThreshold, cfg.hammingThreshold, cfg.minLcs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nVerified = verified.count()
    focusFeatures.unpersist()

    if (nVerified == 0) {
      // nothing merged this round — skip the CC/score jobs entirely
      verified.unpersist()
      (st, PhaseStat("final", macroItr, -1L, 0L, -1L, prevSingles, 0.0))
    } else {
      // Incremental union-find on the LABEL graph: new pairs touch existing
      // clusters, so mapping endpoints to their current labels gives a graph
      // with ≤ nVerified edges — orders of magnitude smaller than re-running
      // CC over all assignment edges (which made late macro rounds cost more
      // than the main pass). Small label graphs union-find on the driver
      // (the reference's own merge structure, :399-418); large ones fall
      // back to distributed CC.
      val la = st.assign.select(col("row_id").as("a"), col("cluster_id").as("la"))
      val lb = st.assign.select(col("row_id").as("b"), col("cluster_id").as("lb"))
      val labelEdges = verified.join(la, "a").join(lb, "b")
        .where(col("la") =!= col("lb"))
        .select(col("la").as("a"), col("lb").as("b")).distinct()

      // Bounded driver pull: probe at most 100k+1 label edges; if the graph
      // is larger, never collect it — distributed CC instead. (Round-1 gated
      // on nVerified ≤ 1M, a generous indirect bound — VERDICT r1 #5.)
      val labelEdgeCap = 100000
      val probe = labelEdges.limit(labelEdgeCap + 1).collect()
      val remap: DataFrame =
        if (probe.length <= labelEdgeCap) {
          val edges = probe.map(r => (r.getLong(0), r.getLong(1)))
          val parent = scala.collection.mutable.Map.empty[Long, Long]
          def find(x: Long): Long = {
            var r0 = x
            while (parent.getOrElse(r0, r0) != r0) r0 = parent(r0)
            var c = x
            while (parent.getOrElse(c, c) != r0) { val nx = parent(c); parent(c) = r0; c = nx }
            r0
          }
          edges.foreach { case (x, y) =>
            val (px, py) = (find(x), find(y))
            if (px != py) parent(math.max(px, py)) = math.min(px, py) // min-center (:413)
          }
          val pairs = parent.keys.map(k => (k, find(k))).filter(p => p._1 != p._2).toSeq
          import spark.implicits._
          pairs.toDF("cluster_id", "new_cluster_id")
        } else {
          ConnectedComponents.components(spark, labelEdges)
            .where(col("row_id") =!= col("cluster_id"))
            .select(col("row_id").as("cluster_id"), col("cluster_id").as("new_cluster_id"))
        }

      val assign = st.assign
        .join(broadcast(remap), Seq("cluster_id"), "left")
        .select(col("row_id"),
          coalesce(col("new_cluster_id"), col("cluster_id")).as("cluster_id"))
        .localCheckpoint(false)
      // EAGER: scores must materialize while `verified` is still cached —
      // and before the old scores checkpoint is freed below.
      val scores = st.scores
        .unionAll(endpointCounts(verified))
        .groupBy("row_id").agg(sum("score").as("score"))
        .localCheckpoint()
      val (clusters, singles) = clusterStats(assign) // materializes assign
      verified.unpersist()
      // new state is materialized — free the superseded round's checkpoint
      // blocks NOW (driver GC would retain them for the whole run: the
      // round-1 scale-killer that exhausted scratch disk at 8M+ rows)
      graft.util.Checkpoints.unpersistCheckpoint(remap)
      graft.util.Checkpoints.unpersistCheckpoint(st.assign)
      graft.util.Checkpoints.unpersistCheckpoint(st.scores)
      val workRate =
        if (prevSingles == 0) 0.0
        else (prevSingles - singles).toDouble / prevSingles
      (State(assign, scores),
        PhaseStat("final", macroItr, -1L, nVerified, clusters, singles, workRate))
    }
  }

  def run(spark: SparkSession, images: DataFrame, cfg: GraftConfig = GraftConfig()): Result = {
    // 1. Featurize -- bytes column pruned from the scan (SURVEY.md par.4).
    // The shingle array is consumed inside featurize (minhash/simhash);
    // verification recomputes caption grams at the verify site, so the
    // cached relation carries ~10x less per row without it.
    // The cache is HASH-PARTITIONED ON row_id: every macro round joins this
    // relation 4-6 times on row_id (verify sides, focus filter), and the
    // cached partitioning propagates through the projections, so those
    // joins shuffle only the (much smaller) pair side — profiled at 8M
    // rows, the per-round full-corpus re-shuffles dominated macro-round
    // cost at both parallelism levels.
    val features = MinHash.featurize(spark, images, cfg).toDF()
      .drop("shingles")
      .repartition(col("row_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one job: materialize the cache AND collect (n, typical caption length)
    val meta = features.agg(count(lit(1)), max(length(col("caption")))).head()
    val n = meta.getLong(0)
    val capLen = meta.getInt(1)

    val stats = scala.collection.mutable.ArrayBuffer.empty[PhaseStat]
    val tInit = System.nanoTime()
    var (st, stat0) = initialState(spark, features, cfg, n, capLen)
    stats += stat0.copy(seconds = (System.nanoTime() - tInit) / 1e9)

    // 4. Final clustering: macro rounds over the focus set (C5/C6) — budget
    // and bad-round patience scale with n (RoundControl).
    val ctl = RoundControl(cfg, n)
    var macroItr = 1
    var bad = 0
    var done = false
    var prevSingles = stats.last.singles
    while (!done && macroItr <= ctl.maxMacro) {
      if (prevSingles == 0) { done = true }
      else {
        val tR = System.nanoTime()
        val (st2, stat0) = macroStep(spark, features, st, cfg, macroItr, prevSingles)
        st = st2
        val stat = stat0.copy(seconds = (System.nanoTime() - tR) / 1e9)
        stats += stat
        val (nbad, stop) = ctl.step(bad, macroItr, prevSingles, stat)
        bad = nbad
        done = stop
        prevSingles = stat.singles
        macroItr += 1
      }
    }

    Result(st.assign, st.scores, features, stats.toSeq)
  }
}
