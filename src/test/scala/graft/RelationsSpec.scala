package graft

import graft.pipeline.Pipeline
import graft.sources.Pages
import graft.model.Gazetteer

class RelationsSpec extends SparkSpec {

  test("co-occurrence triples match the plant arithmetic exactly") {
    val got = graft.relations.Relations.cooccurrence(Pipeline.mentions(spark, sfTiny))
      .collect().map(t => (t.subj, t.pred, t.obj, t.url)).sorted.toSeq
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.flatMap { id =>
      (0 until Pages.nPlanted(id)).flatMap { j =>
        val url = Pages.urlOf(id)
        val p = Gazetteer.persons(Pages.personIdx(id, j))
        val o = Gazetteer.orgs(Pages.orgIdx(id, j))
        val pr = Gazetteer.provisions(Pages.provIdx(id, j))
        val l = Gazetteer.laws(Pages.lawIdx(id, j))
        Seq((p, "cites", l, url), (p, "member_of", o, url), (pr, "part_of", l, url))
      }
    }.sorted.toSeq
    assert(got == expected)
  }

  test("cooccurrenceContiguous ≡ cooccurrence on the live scan output") {
    // mentionsCached, not mentions: exercises contiguity THROUGH the memo's
    // url-hash re-clustering exchange, the riskier of the two shapes
    val ms = Pipeline.mentionsCached(spark, sfTiny)
    val grouped = graft.relations.Relations.cooccurrence(ms)
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.score)).sorted.toSeq
    val contiguous = graft.relations.Relations.cooccurrenceContiguous(ms)
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.score)).sorted.toSeq
    assert(contiguous == grouped)
  }

  test("cooccurrenceContiguous fails loudly on non-contiguous input (never wrong triples)") {
    import spark.implicits._
    import graft.model.Mention
    // two interleaved segments in ONE partition: key A, key B, key A again
    val ms = Seq(
      Mention("u1", 1, 1, "Ada Person", "PERSON", 0, 10, 1.0),
      Mention("u1", 1, 2, "Some Org", "ORG", 0, 8, 1.0),
      Mention("u1", 1, 1, "Acme Law", "LAW", 20, 28, 1.0)
    ).toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      graft.relations.Relations.cooccurrenceContiguous(ms).collect()
    }
    assert(e.getMessage.contains("not segment-contiguous") ||
      Option(e.getCause).exists(_.getMessage.contains("not segment-contiguous")))
  }

  test("mentionedInContiguous ≡ mentionedIn on the live scan output") {
    val ms = Pipeline.mentionsCached(spark, sfTiny)
    val canonDf = Pipeline.canonCached(spark, sfTiny)
    val joined = graft.relations.Relations.mentionedIn(ms, canonDf)
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.score)).sorted.toSeq
    val contiguous = graft.relations.Relations.mentionedInContiguous(
        ms, graft.canon.Canon.snapshot(canonDf))
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.score)).sorted.toSeq
    assert(contiguous == joined)
  }

  test("triplesContiguous ≡ cooccurrence ∪ mentionedIn on the live scan output") {
    val ms = Pipeline.mentionsCached(spark, sfTiny)
    val canonDf = Pipeline.canonCached(spark, sfTiny)
    val fused = graft.relations.Relations.triplesContiguous(
        ms, graft.canon.Canon.snapshot(canonDf))
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.score)).sorted.toSeq
    val legs = (graft.relations.Relations.cooccurrence(ms).collect() ++
        graft.relations.Relations.mentionedIn(ms, canonDf).collect())
      .map(t => (t.subj, t.pred, t.obj, t.url, t.score)).sorted.toSeq
    assert(fused == legs)
  }

  test("mentionedInContiguous fails loudly on non-url-contiguous input") {
    import spark.implicits._
    import graft.model.Mention
    val ms = Seq(
      Mention("u1", 1, 1, "Ada Person", "PERSON", 0, 10, 1.0),
      Mention("u2", 1, 1, "Ada Person", "PERSON", 0, 10, 1.0),
      Mention("u1", 1, 2, "Ada Person", "PERSON", 5, 15, 1.0)
    ).toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      graft.relations.Relations.mentionedInContiguous(
        ms, Map("Ada Person" -> "Ada Person")).collect()
    }
    assert(e.getMessage.contains("not url-contiguous") ||
      Option(e.getCause).exists(_.getMessage.contains("not url-contiguous")))
  }

  test("flagship entry() returns triples on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("subj", "pred", "obj", "url", "score"))
  }
}
