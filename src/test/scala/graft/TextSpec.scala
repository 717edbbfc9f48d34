package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.Text

class TextSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("normWs collapses runs of unicode whitespace like python str.split") {
    assert(Text.normWs("  a\t b\n\nc   d  ") == "a b c d")
    assert(Text.normWs("") == "")
    assert(Text.normWs("   ") == "")
    assert(Text.normWs("one") == "one")
    assert(Text.normWs("a b") == "a b") // NBSP is whitespace to Python str.split
  }

  test("normWs is idempotent (property)") {
    check(Prop.forAll(Gen.asciiStr) { s =>
      val once = Text.normWs(s); Text.normWs(once) == once
    }, "normWs idempotent")
  }

  test("unaccent folds the corpus alphabet like DuckDB strip_accents") {
    assert(Text.unaccent("María Elena Vásquez") == "Maria Elena Vasquez")
    assert(Text.unaccent("Ana Lucía Montaño") == "Ana Lucia Montano")
    assert(Text.unaccent("ASCII stays") == "ASCII stays")
    assert(Text.unaccent("àâäéèêëïîöôùûüçñ") == "aaaeeeeiioouuucn")
  }

  test("levenshtein agrees with known distances") {
    assert(Text.levenshtein("kitten", "sitting") == 3)
    assert(Text.levenshtein("", "abc") == 3)
    assert(Text.levenshtein("abc", "abc") == 0)
    assert(Text.levRatio("elisabeth mwangi", "elisabet mwangi") > 0.79)
  }

  test("tokensWithPos matches \\b\\w+\\b semantics with offsets") {
    val t = Text.tokensWithPos("Ali went to Rio-Plateado.")
    assert(t == Vector(("ali", 0, 3), ("went", 4, 8), ("to", 9, 11),
      ("rio", 12, 15), ("plateado", 16, 24)))
  }

  test("tokensWithPos offsets slice back to the token (property)") {
    check(Prop.forAll(Gen.asciiStr) { s =>
      Text.tokensWithPos(s).forall { case (tok, st, en) =>
        s.substring(st, en).toLowerCase(java.util.Locale.ROOT) == tok
      }
    }, "token offsets")
  }

  // Goldens are CPython str.title() outputs — the byte-parity edge SURVEY
  // §7.6 risk 2 flagged (initcap gives "O'neill"/"Anna-maria"/"3rd").
  test("pyTitle matches Python str.title() on apostrophe/hyphen/digit edges") {
    assert(Text.pyTitle("o'neill") == "O'Neill")
    assert(Text.pyTitle("they're bill's friends from the uk") == "They'Re Bill'S Friends From The Uk")
    assert(Text.pyTitle("anna-maria lópez") == "Anna-Maria López")
    assert(Text.pyTitle("3rd act") == "3Rd Act")
    assert(Text.pyTitle("maria elena vasquez") == "Maria Elena Vasquez")
    assert(Text.pyTitle("MARIA ELENA") == "Maria Elena")
    assert(Text.pyTitle("") == "")
    assert(Text.pyTitle("x") == "X")
  }

  test("sentence-tag encode/decode round-trips (reference wrap/unwrap semantics)") {
    val text = "First sentence. Second one! Third?  Trailing fragment."
    val sentences = Text.splitSentences(text)
    assert(sentences == Vector("First sentence.", "Second one!", "Third?", "Trailing fragment."))
    val encoded = Text.encodeSentenceTags(text)
    assert(encoded.startsWith("[SENTENCE_1] First sentence. [SENTENCE_1]"))
    val decoded = Text.decodeSentenceTags(encoded)
    assert(decoded == sentences.zipWithIndex.map { case (s, i) => (i + 1) -> s }.toMap)
    // DOTALL: embedded newlines survive the round trip
    val multi = Text.decodeSentenceTags("[SENTENCE_3] line one\nline two [SENTENCE_3]")
    assert(multi == Map(3 -> "line one\nline two"))
    // unmatched / mismatched tags decode to nothing rather than throwing
    assert(Text.decodeSentenceTags("[SENTENCE_1] dangling [SENTENCE_2]") == Map.empty)
    assert(Text.decodeSentenceTags("no tags at all") == Map.empty)
    // round trip over a planted page text (the q_sentences surface)
    val page = graft.sources.Pages.pageText(7, "plain word soup here")
    val rt = Text.decodeSentenceTags(Text.encodeSentenceTags(page))
    assert(rt.keySet == (1 to Text.splitSentences(page).length).toSet)
    assert(Text.splitSentences(page).zipWithIndex.forall { case (s, i) => rt(i + 1) == s })
  }
}
