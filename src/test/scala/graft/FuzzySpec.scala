package graft

import graft.fuzzy.Fuzzy
import graft.model.{Config, Segment}

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

  test("ratioTokens is element-level, not a char ratio of the joined strings") {
    val eps = 1e-12
    // SequenceMatcher(None, ['jon','smith'], ['john','smith']).ratio() == 0.5
    assert(math.abs(Fuzzy.ratioTokens(Vector("jon", "smith"), Vector("john", "smith")) - 0.5) < eps)
    // char ratio of the joined strings would be ~0.95 — the old (wrong) score
    assert(Fuzzy.ratio("jon smith", "john smith") > 0.9)
    assert(Fuzzy.ratioTokens(Vector("a", "b", "c"), Vector("b", "c", "a")) == 2.0 * 2 / 6)
    assert(Fuzzy.ratioTokens(Vector(), Vector()) == 1.0)
    assert(Fuzzy.ratioTokens(Vector("x"), Vector("x")) == 1.0)
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

  test("charWindowMatches normalizes candidate whitespace before scoring") {
    // the raw candidate has a double space; normalize_text collapses it, so
    // the score is an exact 1.0 against the normalized entity
    val text = "Witness Maria  Elena Vasquez confirmed the account to the panel."
    val ms = Fuzzy.charWindowMatches(text, "Maria Elena Vasquez")
    assert(ms.nonEmpty)
    assert(ms.head.score == 1.0)
    assert(text.substring(ms.head.start, ms.head.end).replaceAll("\\s+", " ")
      == "Maria Elena Vasquez")
  }

  test("charWindowMatches enforces the >=3 candidate length floor") {
    // entity of length 4 → tol = 1 → adjusted lengths {3,4,5}, none below 3;
    // an exact hit still scores 1.0
    val ms = Fuzzy.charWindowMatches("the best abcd in town of considerable length", "abcd")
    assert(ms.exists(m => m.matched == "abcd" && m.score == 1.0))
    ms.foreach(m => assert(m.matched.length >= 3))
  }

  test("tokenWindowMatches: case/punct variants hit at ratio 1.0, typos do not") {
    val hit = Fuzzy.tokenWindowMatches("Report filed by JONATHAN smith, yesterday.", "Jonathan Smith")
    assert(hit.size == 1)
    assert(hit.head.score == 1.0)
    assert(hit.head.matched == "JONATHAN smith")
    // a 2-token entity with one typo'd token is 0.5 element-wise — below 0.8
    assert(Fuzzy.tokenWindowMatches("Report filed by Jonatan Smit yesterday.", "Jonathan Smith").isEmpty)
  }

  test("tokenWindowMatches emits EVERY qualifying window (no skip after a hit)") {
    // 'alpha beta alpha beta alpha' vs entity 'alpha beta': windows at token
    // 0 and 2 are exact; window at 1 ('beta alpha') is a transposition = 0.5
    val text = "alpha beta alpha beta alpha"
    val ms = Fuzzy.tokenWindowMatches(text, "alpha beta")
    assert(ms.map(_.start) == List(0, 11))
    // overlapping qualifying windows are all emitted (reference has no
    // i += n skip): 'x x x' vs 'x x' hits at token 0 AND token 1
    val over = Fuzzy.tokenWindowMatches("x x x", "x x")
    assert(over.size == 2)
  }

  test("scan passes the threshold through") {
    import spark.implicits._
    val segs = Seq(Segment("u1", 1, 1, "Text", "met john smith and jon smith here")).toDS()
    // at 0.8 only the exact token window matches; at 0.4 every window
    // sharing one of the two tokens scores 0.5 and qualifies:
    // [met,john] [smith,and] [jon,smith] [smith,here] + the exact hit
    val strict = Fuzzy.scan(segs, Array("John Smith" -> "PERSON")).collect()
    assert(strict.length == 1)
    val loose = Fuzzy.scan(segs, Array("John Smith" -> "PERSON"), threshold = 0.4).collect()
    assert(loose.length == 5)
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
      Segment("u1", 1, 1, "Text", "Counsel jonathan smith appeared before the court."),
      Segment("u2", 1, 1, "Text", "No entities live in this sentence.")
    ).toDS()
    val out = Fuzzy.scan(segs, Array("Jonathan Smith" -> "PERSON")).collect()
    assert(out.length == 1)
    assert(out.head.url == "u1" && out.head.label == "PERSON")
    assert(out.head.score == 1.0)
  }

  test("M4 slidingWindows: window/slide sizes and last_slide_end_index rebase") {
    // 25 single-char tokens → windows at token 0, 10, 20 (slide 10 of 25)
    val toks = (0 until 25).map(i => ('a' + i % 26).toChar.toString)
    val ws = Fuzzy.slidingWindows(toks)
    assert(ws.length == 3)
    // window 0 holds tokens [0,20), window 1 [10,25), window 2 [20,25)
    assert(ws(0)._1 == toks.slice(0, 20).mkString(" "))
    assert(ws(1)._1 == toks.slice(10, 25).mkString(" "))
    assert(ws(2)._1 == toks.slice(20, 25).mkString(" "))
    // rebase: offset k = Σ len(slide_text_j) + 1 over j < k (GLiNERModel.py:70-72)
    assert(ws(0)._2 == 0)
    assert(ws(1)._2 == toks.slice(0, 10).mkString(" ").length + 1)
    assert(ws(2)._2 == ws(1)._2 + toks.slice(10, 20).mkString(" ").length + 1)
    // constants actually consumed from Config
    assert(Config.SlideWindow == 20 && Config.SlideStep == 10)
  }

  test("M4 windowedTokenScan equals the direct scan on pure word-space text") {
    // joined-token coords == raw coords when text is single-space words;
    // spans ≤ slide tokens always land fully inside some window
    val words = (0 until 60).map(i => s"w$i").toVector
      .updated(7, "maria").updated(8, "vasquez")
      .updated(33, "maria").updated(34, "vasquez")
    val text = words.mkString(" ")
    val direct = Fuzzy.tokenWindowMatches(text, "Maria Vasquez")
    val windowed = Fuzzy.windowedTokenScan(text, "Maria Vasquez")
    assert(direct.nonEmpty)
    assert(windowed == direct)
  }
}
