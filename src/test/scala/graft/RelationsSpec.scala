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

  test("flagship entry() returns triples on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("subj", "pred", "obj", "url", "score"))
  }
}
