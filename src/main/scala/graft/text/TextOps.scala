package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column algebra (whole-stage codegen; no UDFs) so
  * they hold up at 100 TB — each is a single projection over the scan.
  */
object TextOps {

  /** Token count via whitespace split + a crude BPE-ish proxy: tokens plus
    * one extra unit per 4 chars of long words (subword pieces). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      size(words).as("n_tokens"),
      length(col("text")).as("n_chars_obs"),
      // BPE-ish proxy: ceil(len/4) summed over words — integer math only
      aggregate(words, lit(0L), (acc, w) => acc + shiftright(length(w) + 3, 2).cast("long"))
        .as("n_subwords"))
  }

  private val STOPWORDS = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Quality scoring: mean word length, stopword ratio, punctuation count,
    * uppercase ratio — rounded for engine-parity checks. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val nTok = size(words)
    val stopHits = STOPWORDS.map(s =>
      size(filter(words, w => w === s)).cast("long")).reduce(_ + _)
    docs.select(
      col("doc_id"),
      round(length(col("text")).cast("double") / nTok, 6).as("mean_word_len"),
      round(stopHits.cast("double") / nTok, 6).as("stopword_ratio"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", "")))
        .as("n_punct"))
  }

  private val LANG_MARKERS: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "de" -> Seq(" der ", " und ", " ist "),
    "es" -> Seq(" el ", " la ", " es "),
    "fr" -> Seq(" le ", " et ", " est "))

  private def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / marker.length)
      .cast("long")

  /** Language-ID n-gram heuristic: count marker-substring hits per language,
    * argmax with alphabetical tie-break, "und" (undetermined) when no marker
    * hits at all. Deterministic — same arithmetic is expressible in the
    * DuckDB oracle. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = LANG_MARKERS.foldLeft(docs.select(col("doc_id"), col("text"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"score_$lang",
          markers.map(m => occurrences(col("text"), m)).reduce(_ + _))
    }
    val langs = LANG_MARKERS.map(_._1)
    val maxScore = greatest(langs.map(l => col(s"score_$l")): _*)
    // argmax with alphabetical tie-break: probe languages in sorted order
    val pick = langs.sorted.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
    scored.select((col("doc_id") +: pick.as("lang_pred") +:
      langs.map(l => col(s"score_$l"))): _*)
  }

  /** Rolling-hash document fingerprint: left fold (h*31 + ascii(c)) mod p —
    * expressible identically in DuckDB (list_reduce) for the oracle. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val p = 1000000007L
    val chars = transform(sequence(lit(1), length(col("text"))),
      i => ascii(col("text").substr(i, lit(1))).cast("long"))
    docs.select(
      col("doc_id"),
      aggregate(chars, lit(0L), (h, c) => (h * 31 + c) % p).as("fingerprint"))
  }
}
