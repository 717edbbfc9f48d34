package graft.functions

import java.text.Normalizer

/** Pure text primitives shared by the extractor, mention scan, and
  * canonicalization. Each mirrors a reference behavior (file:line cited)
  * and is kept engine-side deterministic so the DuckDB oracle can reproduce
  * it with builtin SQL functions.
  */
object Text {

  /** Whitespace-collapse normalization — THE canonical text normalization of
    * the reference, `" ".join(text.split())`
    * (src/ollama_entity_extraction/OllamaNERExtractor.py:199 and 4 dupes).
    * Python str.split() splits on Unicode whitespace, so we match with
    * Character.isWhitespace + NBSP rather than Java's ASCII-only \s.
    */
  def normWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      // isSpaceChar covers NBSP/narrow-NBSP, which Python str.split treats
      // as whitespace but Java isWhitespace does not.
      if (Character.isWhitespace(c) || Character.isSpaceChar(c)) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.toString
  }

  /** Accent folding — reference `unidecode(name)` used as a grouping key
    * (src/check_heuristics.py:23-42). NFD + combining-mark strip matches
    * DuckDB's strip_accents on the Latin alphabet this corpus uses.
    */
  def unaccent(s: String): String = {
    if (s == null) return null
    var needs = false
    var i = 0
    while (i < s.length && !needs) { if (s.charAt(i) >= 0x80) needs = true; i += 1 }
    if (!needs) return s // fast path: pure-ASCII strings dominate at scale
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val c = d.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    sb.toString
  }

  /** Canonical comparison key for entity similarity: unaccent + lowercase
    * (reference compares via unidecode at check_heuristics.py:50).
    */
  def simKey(s: String): String = unaccent(s).toLowerCase(java.util.Locale.ROOT)

  /** The tokenizer's own equivalence key: lowercased word-char tokens
    * ([[tokensWithPos]]) joined by single spaces. Two strings share a
    * tokenKey iff the token-fuzzy matcher ([[graft.fuzzy.Fuzzy.tokenWindowMatches]])
    * scores them at ratio exactly 1.0 — case and punctuation variants
    * collapse, genuinely different token sequences never do.
    */
  def tokenKey(s: String): String = tokensWithPos(s).map(_._1).mkString(" ")

  /** Python `str.title()` byte parity (P2 — the reference title-cases names,
    * OllamaEntityCleaner normalization): a cased letter is titlecased when
    * the PREVIOUS char is not cased, lowercased otherwise; non-cased chars
    * pass through and restart a word. Differs from Spark's initcap on
    * apostrophes/hyphens/digits: "o'neill" → "O'Neill" (initcap: "O'neill"),
    * "3rd act" → "3Rd Act".
    */
  def pyTitle(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val cased = Character.isUpperCase(c) || Character.isLowerCase(c) ||
        Character.getType(c) == Character.TITLECASE_LETTER
      if (cased) {
        sb.append(if (prevCased) Character.toLowerCase(c) else Character.toTitleCase(c))
        prevCased = true
      } else {
        sb.append(c)
        prevCased = false
      }
      i += 1
    }
    sb.toString
  }

  /** Tokenizer with character positions — reference `\b\w+\b` finditer
    * (check_token_based_match.py:9-19). Emits (token, start, end-exclusive),
    * token lowercased like the reference.
    */
  def tokensWithPos(s: String): Vector[(String, Int, Int)] = {
    val out = Vector.newBuilder[(String, Int, Int)]
    var i = 0
    while (i < s.length) {
      if (isWordChar(s.charAt(i))) {
        val start = i
        while (i < s.length && isWordChar(s.charAt(i))) i += 1
        out += ((s.substring(start, i).toLowerCase(java.util.Locale.ROOT), start, i))
      } else i += 1
    }
    out.result()
  }

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Sentence split mirroring the reference's `(?<=[.!?])\s+` lookbehind
    * (check_ner_sentence_number.py:7; also the q_sentences split).
    */
  def splitSentences(text: String): Vector[String] =
    text.trim.split("(?<=[.!?])\\s+").iterator.map(_.trim).filter(_.nonEmpty).toVector

  /** Sentence-tag encode (P6 variant, check_ner_sentence_number.py:6-12):
    * every sentence is wrapped on BOTH sides with its 1-based tag —
    * `[SENTENCE_i] s [SENTENCE_i]` — so a downstream annotator can cite a
    * sentence by number without character offsets.
    */
  def encodeSentenceTags(text: String): String =
    splitSentences(text).zipWithIndex
      .map { case (s, i) => s"[SENTENCE_${i + 1}] $s [SENTENCE_${i + 1}]" }
      .mkString(" ")

  /** Inverse of [[encodeSentenceTags]] (check_ner_sentence_number.py:14-16):
    * backreferenced tag pairs → (sentence number → trimmed sentence), DOTALL
    * so embedded newlines survive.
    */
  def decodeSentenceTags(encoded: String): Map[Int, String] = {
    val p = java.util.regex.Pattern.compile(
      "\\[SENTENCE_(\\d+)\\](.*?)\\[SENTENCE_\\1\\]", java.util.regex.Pattern.DOTALL)
    val m = p.matcher(encoded)
    val b = Map.newBuilder[Int, String]
    while (m.find()) b += m.group(1).toInt -> m.group(2).trim
    b.result()
  }

  /** Levenshtein ratio as used by the similarity predicate
    * (OllamaNERExtractor.py:122-126): 1 - lev / max(len). The lev itself is
    * Spark's builtin `levenshtein` in plan-land; this JVM twin exists for
    * tests and driver-side goldens.
    */
  def levRatio(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 1.0 else 1.0 - levenshtein(a, b).toDouble / m
  }

  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length)
  }
}
