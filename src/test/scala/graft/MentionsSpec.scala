package graft

import graft.mentions.{AhoCorasick, Mentions}
import graft.model.{Gazetteer, Mention, Segment}
import graft.pipeline.Pipeline
import graft.sources.Pages

class MentionsSpec extends SparkSpec {

  test("AhoCorasick finds all occurrences with word bounds") {
    val ac = AhoCorasick(Array("Article 12", "Article 128", "Carlos Mendez", "Carlos Mendez Rivera"))
    // inside "Article 128", "Article 12" fails the word-boundary check
    assert(ac.scan("see Article 128 here") == List((1, 4, 15)))
    assert(ac.scan("see Article 12 here") == List((0, 4, 14)))
    // contiguous prefix surface: both match (resolution picks the longer)
    assert(ac.scan("by Carlos Mendez Rivera.").map(_._1).toSet == Set(2, 3))
    assert(ac.scan("") == Nil)
    assert(ac.scan("nothing to see") == Nil)
  }

  test("resolveOverlaps keeps leftmost-longest (reference O2+O3 semantics)") {
    def m(s: Int, e: Int, surf: String) = Mention("u", 1, 1, surf, "X", s, e, 1.0)
    val resolved = Mentions.resolveOverlaps(List(m(0, 13, "Carlos Mendez"), m(0, 20, "Carlos Mendez Rivera"), m(15, 21, "x"), m(21, 25, "y")))
    assert(resolved.map(_.surface) == List("Carlos Mendez Rivera", "y"))
  }

  test("resolveOverlaps breaks identical-span ties deterministically (smallest surface)") {
    def m(surf: String) = Mention("u", 1, 1, surf, "PERSON", 0, 16, 1.0)
    // ensemble unions can carry the same span under case-twin surfaces; the
    // totalized sort key must pick the same winner on any input permutation
    val a = m("Fatima Al Rashid"); val b = m("Fatima al Rashid")
    assert(Mentions.resolveOverlaps(List(a, b)).map(_.surface) == List("Fatima Al Rashid"))
    assert(Mentions.resolveOverlaps(List(b, a)).map(_.surface) == List("Fatima Al Rashid"))
  }

  test("ensemble union + cross-extractor resolution equals the exact scan modulo case twins (O7)") {
    val segs = Pipeline.segments(spark, sfTiny)
    val exact = Mentions.scan(segs, Gazetteer.all.toArray)
    val fuzzy = graft.fuzzy.Fuzzy.scan(segs, Gazetteer.persons.map(_ -> "PERSON").toArray)
    val resolved = Mentions.resolveAcrossExtractors(exact.unionByName(fuzzy)).collect()
      .map(m => (m.url, m.seg_no, m.start, m.surface, m.label)).sorted.toSeq
    def caseCanon(s: String): String = s match {
      case "Fatima al Rashid" => "Fatima Al Rashid" // g5 twin, smaller surface wins
      case other              => other
    }
    val exactOnly = exact.collect()
      .map(m => (m.url, m.seg_no, m.start, caseCanon(m.surface), m.label)).sorted.toSeq
    assert(resolved == exactOnly)
  }

  test("scan over planted corpus finds exactly the planted mentions") {
    val ms = Pipeline.mentions(spark, sfTiny).collect()
    // expected from the same plant arithmetic (independent of the scan path)
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.flatMap { id =>
      (0 until Pages.nPlanted(id)).flatMap { j =>
        Seq(
          (Pages.urlOf(id), Gazetteer.persons(Pages.personIdx(id, j)), "PERSON"),
          (Pages.urlOf(id), Gazetteer.orgs(Pages.orgIdx(id, j)), "ORG"),
          (Pages.urlOf(id), Gazetteer.gpes(Pages.gpeIdx(id, j)), "GPE"),
          (Pages.urlOf(id), Gazetteer.provisions(Pages.provIdx(id, j)), "PROVISION"),
          (Pages.urlOf(id), Gazetteer.laws(Pages.lawIdx(id, j)), "LAW"))
      }
    }
    val got = ms.map(m => (m.url, m.surface, m.label))
    assert(got.sorted.toSeq == expected.sorted.toSeq)
  }

  test("mention offsets slice the segment text to the surface") {
    val segs = Pipeline.segments(spark, sfTiny).collect().map(s => (s.url, s.seg_no) -> s.text).toMap
    val ms = Pipeline.mentions(spark, sfTiny).collect()
    assert(ms.nonEmpty)
    ms.foreach { m =>
      val text = segs((m.url, m.seg_no))
      assert(text.substring(m.start, m.end) == m.surface)
    }
  }

  test("F5 rider survives fuzzy recall at ratio 1.0: tokenKey equivalence, not verbatim") {
    import spark.implicits._
    // A lowercase variant of a gazetteer surface with no exact hit: the
    // token matcher recovers it at ratio exactly 1.0, and its slice differs
    // from the surface VERBATIM but tokenKey-matches — the case that a
    // score==1.0 slice==surface check would wrongly abort q_mentions on.
    val seg = Segment("u", 1, 1, "p", "the maria elena vasquez hearing")
    val gaz = Array(("Maria Elena Vasquez", "PERSON"))
    val ms = Mentions.scanWithRecall(Seq(seg).toDS(), gaz).collect()
    assert(ms.length == 1)
    val m = ms.head
    assert(m.score == 1.0)
    val slice = seg.text.substring(m.start, m.end)
    assert(slice != m.surface) // the verbatim equality the old check required
    assert(graft.functions.Text.tokenKey(slice) ==
      graft.functions.Text.tokenKey(m.surface))
    // the full provenance predicate (q_mentions' F5 rider) accepts both
    // legitimate score-1.0 shapes and trips on every drift direction
    import org.apache.spark.sql.functions.col
    val text = seg.text // "the maria elena vasquez hearing"
    val cases = Seq(
      // (text, start, end, surface, score, expect_violation)
      (text, m.start, m.end, m.surface, 1.0, false), // fuzzy 1.0 case variant
      (text, 4, 23, "maria elena vasquez", 1.0, false), // exact verbatim
      ("met Dr. Chen.", 4, 7, "Dr.", 1.0, false), // verbatim w/ punct boundary
      (text, 4, 24, m.surface, 1.0, true),  // drift into trailing space
      (text, 3, 23, m.surface, 1.0, true),  // drift into leading space
      (text, 4, 31, m.surface, 1.0, true),  // drift captures next token
      (text, 4, 22, m.surface, 1.0, true),  // short span: token changed
      (text, 4, 60, m.surface, 1.0, true),  // end out of bounds
      (text, 4, 23, m.surface, 0.9, false)) // sub-1.0 fuzzy: bounds only
    val df = cases.map(c => (c._1, c._2, c._3, c._4, c._5))
      .toDF("text", "start", "end", "surface", "score")
    val got = df.withColumn("viol", Mentions.provenanceViolation(
        col("text"), col("start"), col("end"), col("surface"), col("score")))
      .select("viol").collect().map(_.getBoolean(0)).toSeq
    assert(got == cases.map(_._6))
  }

  test("resolveAcrossExtractors matches local resolution on a union of sets") {
    import spark.implicits._
    def m(seg: Int, s: Int, e: Int, surf: String) = Mention("u", 1, seg, surf, "X", s, e, 1.0)
    val ds = Seq(m(1, 0, 5, "aaaaa"), m(1, 3, 10, "bbbbbbb"), m(1, 5, 9, "cccc"), m(2, 0, 2, "dd")).toDS()
    val got = Mentions.resolveAcrossExtractors(ds).collect().map(x => (x.seg_no, x.surface)).sorted
    assert(got.toSeq == Seq((1, "aaaaa"), (1, "cccc"), (2, "dd")))
  }
}
