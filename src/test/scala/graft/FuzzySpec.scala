package graft

import graft.fuzzy.Fuzzy
import graft.model.Segment

class FuzzySpec extends SparkSpec {

  // Goldens computed with Python difflib.SequenceMatcher(autojunk=False),
  // the algorithm the reference calls (check_fuzzy_windows_match.py:60).
  test("ratio matches difflib SequenceMatcher goldens") {
    val eps = 1e-12
    assert(math.abs(Fuzzy.ratio("abcd", "bcde") - 0.75) < eps)
    assert(math.abs(Fuzzy.ratio("maria elena vasquez", "maria helena vasquez") - 0.9743589743589743) < eps)
    assert(math.abs(Fuzzy.ratio("jonathan smith", "jonatan smit") - 0.9230769230769231) < eps)
    assert(Fuzzy.ratio("", "") == 1.0)
    assert(Fuzzy.ratio("a", "") == 0.0)
    assert(Fuzzy.ratio("the quick brown fox", "the quick brown fox") == 1.0)
    assert(math.abs(Fuzzy.ratio("article 12", "artical 12") - 0.9) < eps)
    assert(math.abs(Fuzzy.ratio("kitten", "sitting") - 0.6153846153846154) < eps)
  }

  test("charWindowMatches finds a misspelled planted entity with offsets") {
    val text = "The hearing named Maria Helena Vasquez as lead counsel for the union."
    val ms = Fuzzy.charWindowMatches(text, "Maria Elena Vasquez")
    assert(ms.nonEmpty)
    val m = ms.head
    assert(text.substring(m.start, m.end).contains("Vasquez"))
    assert(m.score >= 0.85)
  }

  test("charWindowMatches rejects below-threshold candidates") {
    assert(Fuzzy.charWindowMatches("completely unrelated text here", "Maria Elena Vasquez").isEmpty)
  }

  test("tokenWindowMatches maps token windows back to char spans") {
    val text = "Report filed by Jonatan Smit yesterday morning."
    val ms = Fuzzy.tokenWindowMatches(text, "Jonathan Smith")
    assert(ms.size == 1)
    val m = ms.head
    assert(text.substring(m.start, m.end) == "Jonatan Smit")
    assert(m.score >= 0.8)
  }

  test("accepted ranges do not overlap") {
    val text = "Maria Elena Vasquez met Maria Elena Vasquez."
    val ms = Fuzzy.charWindowMatches(text, "Maria Elena Vasquez")
    ms.combinations(2).foreach { case Seq(a, b) =>
      assert(a.end <= b.start || b.end <= a.start)
    }
  }

  test("distributed fuzzy scan emits mentions over segments") {
    import spark.implicits._
    val segs = Seq(
      Segment("u1", 1, 1, "Text", "Counsel Jonatan Smit appeared before the court."),
      Segment("u2", 1, 1, "Text", "No entities live in this sentence.")
    ).toDS()
    val out = Fuzzy.scan(segs, Array("Jonathan Smith" -> "PERSON")).collect()
    assert(out.length == 1)
    assert(out.head.url == "u1" && out.head.label == "PERSON")
  }
}
