package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path (bucket fan-out keeps
  * the candidate join linear instead of the full cross product).
  */
object Similarity {

  /** Ordered-fold dot product — bit-exact reproducible (and mirrored in the
    * DuckDB oracle with the same left-to-right summation). */
  def dot(a: Column, b: Column, dim: Int): Column =
    aggregate(sequence(lit(1), lit(dim)), lit(0.0),
      (acc, i) => acc + element_at(a, i).cast("double") * element_at(b, i).cast("double"))

  def norm(a: Column, dim: Int): Column = sqrt(dot(a, a, dim))

  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))

  /** Brute-force cosine top-k: queries x corpus with a window rank.
    * O(|Q|·|C|) — the correctness baseline; broadcast the query side. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q_emb"), col("c_emb"), dim))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rk"))
  }

  /** Seeded random hyperplanes: nPlanes x dim sign matrix derived from
    * mix64 — deterministic, broadcast as a literal-free closure. */
  private def hyperplanes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      // uniform in [-1, 1) from a splittable hash
      val h = Hashing.hash3(seed, p.toLong, d.toLong)
      (h.toDouble / Long.MaxValue)
    }

  /** LSH-bucketed ANN: sign-sketch each vector against `nPlanes` seeded
    * hyperplanes per table (L tables), candidates = same sketch in any
    * table, then exact cosine + top-k on the candidate set only.
    *
    * Parameter note: collision prob per table = (1 - theta/pi)^nPlanes, so
    * nPlanes/tables must be tuned to the data's angular margin. The synthetic
    * test embeddings have top-5 cosine ~ 0.3 (theta ~ 72 deg) -> short
    * 4-bit sketches with many tables; real embedding corpora (neighbor
    * cosine >= 0.8) support 12-16 planes with far fewer tables and much
    * sparser buckets. */
  def lshTopK(spark: org.apache.spark.sql.SparkSession, queries: DataFrame,
              corpus: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 4, tables: Int = 32, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val planes = (0 until tables).map(t => hyperplanes(Hashing.hash2(seed, t.toLong), nPlanes, dim)).toArray

    def sketches(df: DataFrame, idCol: String): DataFrame =
      df.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .mapPartitions(_.flatMap { case (id, emb) =>
          planes.iterator.zipWithIndex.map { case (tbl, t) =>
            var sig = 0L
            var p = 0
            while (p < tbl.length) {
              var s = 0.0
              var d = 0
              while (d < emb.length) { s += tbl(p)(d) * emb(d); d += 1 }
              if (s > 0) sig |= (1L << p)
              p += 1
            }
            (id, t, sig)
          }
        }).toDF(idCol, "tbl", "sig")

    val qs = sketches(queries, "query_id")
    val cs = sketches(corpus, "neighbor_id")
    val cand = qs.join(cs, Seq("tbl", "sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()

    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = cand.join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("sim", cosine(col("q_emb"), col("c_emb"), dim))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rk"))
  }
}
