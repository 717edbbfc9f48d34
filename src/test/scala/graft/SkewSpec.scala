package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.skew.Skew

class SkewSpec extends SparkSpec {

  test("salted two-phase agg equals direct groupBy on the skewed domain key") {
    val pages = Pipeline.pages(spark, sfTiny).toDF().cache()
    val salted = Skew.domainStats(pages)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val direct = pages
      .select(regexp_extract(col("url"), "https://site(\\d+)\\.", 1).cast("int").as("domain"),
        length(col("text")).cast("long").as("tl"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_pages"), sum(col("tl")).as("total_text_len"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
    // the corpus really is skewed: head domain owns ~half the pages
    val total = direct.values.map(_._1).sum
    assert(direct(0)._1 > total * 2 / 5, s"head domain share: ${direct(0)._1}/$total")
  }

  test("salt column is deterministic and bounded") {
    import spark.implicits._
    val df = Seq("u1", "u2", "u3").toDF("url")
      .select(Skew.saltCol(col("url"), 8).as("s"))
    val a = df.collect().map(_.getInt(0)).toSeq
    val b = df.collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(a.forall(s => s >= 0 && s < 8))
  }
}
