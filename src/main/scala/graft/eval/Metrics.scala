package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M1–M6 — clustering quality metrics (SURVEY.md §2.8), all computed from
  * ONE contingency table `(cluster_id, true_cluster_id, n)` — one shuffle —
  * instead of the reference's O(n·cluster²) nested scans
  * (`/root/reference/lsh_based_clustering.py:794-930`). Scalars (entropies,
  * pair counts) are aggregated distributively; nothing larger than a handful
  * of doubles ever reaches the driver.
  */
object Metrics {

  final case class Report(
      n: Long,
      clusters: Long,
      singles: Long,
      gammaAccuracy: Map[Double, Double], // M1, γ grid of :804
      falsePositives: Long,               // M2
      trueNegatives: Long,
      falseNegatives: Long,
      truePositives: Long,
      csi: Double,
      nmi: Double,                        // M3
      adjustedRand: Double,               // M4
      purity: Double,                     // M5
      dupPairRecall: Double,              // M6 — the north-star metric
      dupPairPrecision: Double
  )

  val GAMMAS: Seq[Double] = Seq(0.6, 0.7, 0.8, 0.9, 0.95, 0.99, 1.0)

  /** pred: (row_id, cluster_id); truth: (row_id, true_cluster_id).
    *
    * Round-8 job fusion (guide §1.2 / §2.4 — the wall at fixture scale is
    * Spark actions × fixed per-job latency, not data): the 12 actions the
    * round-7 shape ran (clusters, singles, γ, fp, fn, mi, hU, hV,
    * pairsPred, pairsTruth, purity as SEPARATE jobs) are fused into 6 —
    *   1. materialize `joined` (+ n),
    *   2. one single-row agg over predSizes (clusters, singles, hU-sum,
    *      Σ C(ni,2), purity numerator — the per-cluster `max(nij)` now
    *      rides the same groupBy that computes ni),
    *   3. one single-row agg over truthSizes (hV-sum, Σ C(nj,2)),
    *   4. the mi/pairsBoth contingency agg (unchanged expressions),
    *   5. the γ purity-cluster agg (unchanged expressions),
    *   6. fp + fn in ONE job: both anchors attach via `first(...)` over the
    *      two ordered windows (identical to the row_number()=1 join —
    *      the anchor is the min-row_id member's value) and two conditional
    *      sums replace the two join+count jobs.
    * Every per-element expression is unchanged, so the scalar results are
    * the ones the oracles pin; pair counts/anchors are exact integers
    * (order-insensitive), entropy/mi sums keep their existing
    * floating-point semantics. */
  def evaluate(spark: SparkSession, pred: DataFrame, truth: DataFrame): Report = {
    val joined = pred.join(truth.select("row_id", "true_cluster_id"), "row_id")
      .persist()
    val n = joined.count()

    val cont = joined.groupBy("cluster_id", "true_cluster_id")
      .agg(count(lit(1)).as("nij")).persist()

    val predSizes = cont.groupBy("cluster_id")
      .agg(sum("nij").as("ni"), count(lit(1)).as("distinctTruth"),
        max("nij").as("mx"))
    val truthSizes = cont.groupBy("true_cluster_id").agg(sum("nij").as("nj"))

    // ---- fused scalar agg over predSizes: clusters, singles, hU, pairs, purity
    val pRow = predSizes.agg(
      count(lit(1)),
      sum(when(col("ni") === 1, 1L).otherwise(0L)),
      sum(col("ni") / n * log(col("ni") / n.toDouble)),
      sum(col("ni").cast("double") * (col("ni") - 1) / 2),
      sum(col("mx").cast("double"))).head()
    val clusters = pRow.getLong(0)
    val singles = if (pRow.isNullAt(1)) 0L else pRow.getLong(1)
    val hU = if (pRow.isNullAt(2)) 0.0 else -pRow.getDouble(2)
    val pairsPred = if (pRow.isNullAt(3)) 0.0 else pRow.getDouble(3)
    val purityNum = if (pRow.isNullAt(4)) 0.0 else pRow.getDouble(4)

    val tRow = truthSizes.agg(
      sum(col("nj") / n * log(col("nj") / n.toDouble)),
      sum(col("nj").cast("double") * (col("nj") - 1) / 2)).head()
    val hV = if (tRow.isNullAt(0)) 0.0 else -tRow.getDouble(0)
    val pairsTruth = if (tRow.isNullAt(1)) 0.0 else tRow.getDouble(1)

    // ---- M1: γ-accuracy (Rashtchian et al.; reference :794-843).
    // A pred cluster counts for γ iff it is PURE (max_false = 0, :823,:837),
    // not bigger than its true cluster (:825), and covers ≥ γ·|truth| (:824).
    val pure = predSizes.where(col("distinctTruth") === 1)
      .join(cont, "cluster_id") // 1 row per pure cluster
      .join(truthSizes, "true_cluster_id")
      .select(col("ni"), col("nj"))
    val gammaCols = GAMMAS.map(g =>
      sum(when(col("ni") <= col("nj") && col("ni") >= lit(g) * col("nj"), 1L)
        .otherwise(0L)).as(s"g$g"))
    val gammaAgg = pure.agg(gammaCols.head, gammaCols.tail: _*).head()
    val gammaAccuracy = GAMMAS.zipWithIndex.map { case (g, i) =>
      g -> (if (clusters == 0) 0.0
            else (if (gammaAgg.isNullAt(i)) 0L else gammaAgg.getLong(i)).toDouble / clusters)
    }.toMap

    // ---- M2: FP/FN/TP/TN + CSI (reference :845-896), one job.
    // FP: per pred cluster, members whose truth differs from the truth of the
    // cluster's FIRST element (:875 — we anchor on the min row_id member,
    // deterministic where the reference depends on insertion order); FN
    // symmetric per true cluster (:887-896). `first` over the ordered window
    // (default frame: unbounded preceding .. current row) IS the min-row_id
    // member's value, so this equals the old row_number()=1 anchor join.
    val wPred = Window.partitionBy("cluster_id").orderBy("row_id")
    val wTruth = Window.partitionBy("true_cluster_id").orderBy("row_id")
    val fRow = joined
      .select(col("cluster_id"), col("true_cluster_id"),
        first("true_cluster_id").over(wPred).as("anchor_truth"),
        first("cluster_id").over(wTruth).as("anchor_pred"))
      .agg(
        sum(when(col("true_cluster_id") =!= col("anchor_truth"), 1L).otherwise(0L)),
        sum(when(col("cluster_id") =!= col("anchor_pred"), 1L).otherwise(0L))).head()
    val fp = if (fRow.isNullAt(0)) 0L else fRow.getLong(0)
    val fn = if (fRow.isNullAt(1)) 0L else fRow.getLong(1)

    val tn = n - fp
    val tp = n - fn
    val csi = if (tp + fn + fp == 0) 0.0 else tp.toDouble / (tp + fn + fp)

    // ---- M3/M4/M5/M6: entropy / pair-count aggregates over the contingency.
    val agg = cont
      .join(predSizes.select("cluster_id", "ni"), "cluster_id")
      .join(truthSizes, "true_cluster_id")
      .agg(
        // mutual information Σ (nij/n)·ln(n·nij/(ni·nj))
        sum(col("nij") / n * log(col("nij") * n / (col("ni") * col("nj")))).as("mi"),
        // Σ C(nij,2)
        sum(col("nij").cast("double") * (col("nij") - 1) / 2).as("pairsBoth")
      ).head()
    val mi = if (agg.isNullAt(0)) 0.0 else agg.getDouble(0)
    val pairsBoth = if (agg.isNullAt(1)) 0.0 else agg.getDouble(1)

    val nmi =
      if (hU == 0.0 && hV == 0.0) 1.0
      else if ((hU + hV) == 0.0) 0.0
      else (mi / ((hU + hV) / 2.0)).max(0.0)

    val totalPairs = n.toDouble * (n - 1) / 2
    val expected = if (totalPairs == 0) 0.0 else pairsPred * pairsTruth / totalPairs
    val maxIdx = (pairsPred + pairsTruth) / 2.0
    val adjustedRand =
      if (maxIdx - expected == 0.0) 1.0
      else (pairsBoth - expected) / (maxIdx - expected)

    val purity = if (n == 0) 0.0 else purityNum / n

    // M6: dup-pair recall / precision (BASELINE.json north-star metric).
    val dupPairRecall = if (pairsTruth == 0) 1.0 else pairsBoth / pairsTruth
    val dupPairPrecision = if (pairsPred == 0) 1.0 else pairsBoth / pairsPred

    joined.unpersist(); cont.unpersist()
    Report(n, clusters, singles, gammaAccuracy, fp, tn, fn, tp, csi,
      nmi, adjustedRand, purity, dupPairRecall, dupPairPrecision)
  }
}
