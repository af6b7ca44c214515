package graft

import org.apache.spark.sql.functions._

import graft.gen.SyntheticCorpus
import graft.mm.Multimodal

/** Real-decode path of the multimodal plumbing: PNG/JPEG payloads are
  * decoded from actual pixels (javax.imageio) inside the batched
  * mapPartitions, and the decoded width/height/pHash must match what the
  * generator stored alongside the bytes. Unknown payloads degrade to the
  * deterministic fake. */
class MultimodalDecodeSpec extends SparkSpec {

  test("decodeMeta recovers w/h/phash from real PNG and JPEG bytes") {
    import spark.implicits._
    val gen = SyntheticCorpus.generate(spark, SyntheticCorpus.GenConfig(groups = 25)).cache()
    val payloads = gen.toDF().select(
      graft.feat.RowIds.rowIdCol(col("image_id")).as("doc_id"),
      col("bytes").as("payload"))
    val decoded = Multimodal.decodeMeta(spark, payloads)
    val expected = gen.toDF().select(
      graft.feat.RowIds.rowIdCol(col("image_id")).as("doc_id"),
      col("fmt").as("exp_fmt"), col("w").as("exp_w"), col("h").as("exp_h"),
      col("phash").as("exp_phash"))

    val joined = decoded.join(expected, "doc_id")
    assert(joined.count() == gen.count())
    assert(joined.where(col("fmt_detected") =!= col("exp_fmt")).count() == 0,
      "magic-byte sniffing disagreed with the generator's format")
    assert(joined.where(
      col("w") =!= col("exp_w") || col("h") =!= col("exp_h")).count() == 0,
      "decoded dimensions disagree")
    // pHash recomputed from decoded pixels must be bit-identical: the
    // generator computed it through the same decode (encode -> decode ->
    // phash), so any codec/plumbing drift shows up here
    assert(joined.where(col("phash") =!= col("exp_phash")).count() == 0,
      "decoded pHash disagrees with generator pHash")
    gen.unpersist()
  }

  test("unknown payloads degrade to the deterministic fake") {
    import spark.implicits._
    val payloads = Seq((1L, "hello world".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = Multimodal.decodeMeta(spark, payloads).as[(Long, String, Int, Int, Long)].head()
    assert(r._2 == "unknown")
    assert(r._3 == 1 + 'h' % 64 && r._4 == 1 + 'e' % 64)
    assert(r._5 == 0L)
  }
}
