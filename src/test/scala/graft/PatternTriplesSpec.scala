package graft

import graft.model.{Mention, Segment}
import graft.relations.Relations

class PatternTriplesSpec extends SparkSpec {

  test("adjacent-pair connector patterns emit triples with correct direction") {
    import spark.implicits._
    //        0123456789012345678901234567890123456789
    val txt = "Ana Roe representing Acme Corp cited Article 9 of Trade Law."
    val segs = Seq(Segment("u", 1, 1, "Text", txt)).toDS()
    val ms = Seq(
      Mention("u", 1, 1, "Ana Roe", "PERSON", 0, 7, 1.0),
      Mention("u", 1, 1, "Acme Corp", "ORG", 21, 30, 1.0),
      Mention("u", 1, 1, "Article 9", "PROVISION", 37, 46, 1.0),
      Mention("u", 1, 1, "Trade Law", "LAW", 50, 59, 1.0)
    ).toDS()
    val ts = Relations.patternTriples(segs, ms)
      .collect().map(t => (t.subj, t.pred, t.obj)).toSet
    assert(ts.contains(("Ana Roe", "represents", "Acme Corp")))
    assert(ts.contains(("Article 9", "of", "Trade Law")))
    // "cited" connector between Acme Corp and Article 9
    assert(ts.contains(("Acme Corp", "cites", "Article 9")))
    assert(ts.size == 3)
  }

  test("non-connector gaps emit nothing; empty segments are safe") {
    import spark.implicits._
    val segs = Seq(Segment("u", 1, 1, "Text", "Ana Roe met Acme Corp.")).toDS()
    val ms = Seq(
      Mention("u", 1, 1, "Ana Roe", "PERSON", 0, 7, 1.0),
      Mention("u", 1, 1, "Acme Corp", "ORG", 12, 21, 1.0)
    ).toDS()
    assert(Relations.patternTriples(segs, ms).count() == 0)
  }

  test("live corpus: every planted sentence yields its four pattern triples") {
    import graft.pipeline.Pipeline
    val n = Relations.patternTriples(
      Pipeline.segments(spark, sfTiny), Pipeline.mentionsCached(spark, sfTiny)).count()
    // 500 docs, doc_id%3+1 planted sentences each, 4 triples per sentence
    val expected = (0L until 500L).map(id => 4 * (id % 3 + 1)).sum
    assert(n == expected)
  }
}
