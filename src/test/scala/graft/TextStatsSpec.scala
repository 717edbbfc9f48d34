package graft

import graft.textstats.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), lit("xx").as("lang"), lit("src").as("source"), col("text"))

  test("langId picks the language with most marker hits, unknown when none") {
    val docs = docsOf(
      1L -> "the cat sat on the mat and the dog",     // en
      2L -> "la casa de la playa y el mar que brilla", // es
      3L -> "zzz qqq www")                              // no markers
    val got = TextStats.langId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "unknown"))
  }

  test("quality features on a known string") {
    val docs = docsOf(1L -> "the quick brown foxes of doom")
    val r = TextStats.quality(docs).collect().head
    assert(r.getLong(1) == 29)  // n_chars
    assert(r.getLong(2) == 6)   // n_tokens
    assert(r.getLong(3) == 2)   // "the", "of"
    assert(r.getLong(4) == 5)   // "quick"/"brown"/"foxes"
  }

  test("token counts: whitespace vs regex tokens diverge on punctuation") {
    val docs = docsOf(1L -> "a b-c d")
    val r = TextStats.tokenCounts(docs).collect().head
    assert(r.getLong(2) == 3) // ws tokens: a, b-c, d
    assert(r.getLong(3) == 4) // \w+ tokens: a, b, c, d
  }

  test("fingerprints are 16-hex and stable") {
    val fp = TextStats.fingerprints(TextStats.documents(spark, sfTiny)).collect()
    fp.foreach(r => assert(r.getString(1).matches("[0-9a-f]{16}")))
    assert(fp.map(_.getString(1)).distinct.length > fp.length / 2)
  }
}
