package graft.textstats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID
  * (marker-token heuristic), quality scoring (length / stopword ratios),
  * token counting, document fingerprinting. Pure column expressions —
  * whole-stage codegen end to end, filters and projections push to the scan.
  */
object TextStats {

  /** Deterministic marker tokens per language (n-gram heuristic seed —
    * closed-class words, the standard cheap language-ID signal).
    */
  val markers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "of", "en" -> "and", "en" -> "in", "en" -> "to", "en" -> "a",
    "es" -> "de", "es" -> "la", "es" -> "el", "es" -> "que", "es" -> "los", "es" -> "y",
    "de" -> "der", "de" -> "und", "de" -> "die", "de" -> "das", "de" -> "nicht",
    "fr" -> "le", "fr" -> "les", "fr" -> "des", "fr" -> "et", "fr" -> "une"
  )

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))

  /** Language-ID: count marker-token hits per language over the token
    * stream; winner = max hits, ties broken by language code, zero hits →
    * "unknown".
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = markers.toDF("mlang", "marker")
    val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
    val hits = toks.join(broadcast(m), toks("t") === m("marker"))
      .groupBy(col("doc_id"), col("mlang")).agg(count(lit(1)).as("hits"))
    val best = hits.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("hits").desc, col("mlang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("mlang").as("pred_lang"), col("hits"))
    docs.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("unknown")).as("pred_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Quality features per doc: char length, token count, stopword count,
    * longest token — integer-valued so the oracle compare is exact.
    */
  def quality(docs: DataFrame): DataFrame = {
    val stopArr = array(stopwords.map(lit(_)): _*)
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      size(expr(s"filter(split(lower(text), ' '), t -> array_contains(array(${stopwords.map("'" + _ + "'").mkString(",")}), t))"))
        .cast("long").as("n_stop"),
      expr("aggregate(split(text, ' '), 0, (m, t) -> greatest(m, length(t)))")
        .cast("long").as("max_token_len"))
  }

  /** Token counts per source: whitespace tokens + regex word tokens
    * (BPE-ish `\w+` pieces).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        size(split(col("text"), " ")).as("ws"),
        size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).as("re"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("re")).as("re_tokens"))

  /** Document fingerprint: 64-bit content hash (md5 prefix — stable across
    * engines) of the normalized text.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), substring(md5(col("text")), 1, 16).as("fp"))
}
