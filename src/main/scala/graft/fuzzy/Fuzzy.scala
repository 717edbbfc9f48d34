package graft.fuzzy

import org.apache.spark.sql.Dataset
import graft.model.{Config, Mention, Segment}

/** Fuzzy sliding-window similarity matching — the Spark form of the
  * reference's windowed `SequenceMatcher` joins:
  *
  *  - char windows: window = clamp(2.5×len(entity), 50, 500), step = window/2,
  *    candidate substrings of len ±min(20, len/4), ratio ≥ 0.85, overlapping
  *    accepted ranges suppressed (check_fuzzy_windows_match.py:28-119)
  *  - token windows: entity-token-length slices over the doc token stream,
  *    ratio ≥ 0.8, token index mapped back to char span
  *    (check_token_based_match.py:22-58)
  *
  * Text is row-local, so the whole join is a narrow `mapPartitions` over
  * segments with the (small) entity list broadcast — no shuffle; at corpus
  * scale the cost is O(segments × entities × windows), bounded by the
  * automaton pre-filter running first (only segments that had no exact hit
  * need the fuzzy pass).
  */
object Fuzzy {

  final case class FuzzyMatch(entity: String, matched: String, start: Int,
      end: Int, score: Double)

  /** Similarity ratio 2M/(|a|+|b|) where M = total length of the recursive
    * longest-common-block decomposition — the (public, documented) difflib
    * `SequenceMatcher.ratio` algorithm, implemented without the autojunk
    * heuristic (deterministic for all lengths; the reference's windows are
    * ≤500 chars where autojunk rarely triggers).
    */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = totalMatched(a, 0, a.length, b, 0, b.length)
    2.0 * m / (a.length + b.length)
  }

  private def totalMatched(a: String, alo: Int, ahi: Int,
      b: String, blo: Int, bhi: Int): Int = {
    val (bi, bj, size) = longestMatch(a, alo, ahi, b, blo, bhi)
    if (size == 0) 0
    else size +
      totalMatched(a, alo, bi, b, blo, bj) +
      totalMatched(a, bi + size, ahi, b, bj + size, bhi)
  }

  /** Longest matching block in a[alo,ahi) × b[blo,bhi): difflib's j2len
    * dynamic program — leftmost-longest in a, then in b.
    */
  private def longestMatch(a: String, alo: Int, ahi: Int,
      b: String, blo: Int, bhi: Int): (Int, Int, Int) = {
    val b2j = new java.util.HashMap[Character, List[Int]]()
    var j = bhi - 1
    while (j >= blo) { // prepend so lists are ascending
      val c = b.charAt(j)
      b2j.put(c, j :: Option(b2j.get(c)).getOrElse(Nil))
      j -= 1
    }
    var besti = alo; var bestj = blo; var bestsize = 0
    var j2len = new java.util.HashMap[Int, Int]()
    var i = alo
    while (i < ahi) {
      val newj2len = new java.util.HashMap[Int, Int]()
      var hits = Option(b2j.get(a.charAt(i))).getOrElse(Nil)
      while (hits.nonEmpty) {
        val jj = hits.head
        val k = Option(j2len.get(jj - 1)).map(_.toInt).getOrElse(0) + 1
        newj2len.put(jj, k)
        if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
        hits = hits.tail
      }
      j2len = newj2len
      i += 1
    }
    (besti, bestj, bestsize)
  }

  /** Char-window fuzzy search of one entity in one text — reference
    * `fuzzy_match_with_window` semantics: clamp/step arithmetic, candidate
    * length tolerance, per-window best-above-threshold, overlap suppression
    * of accepted ranges (first-come at equal score ordering by position).
    */
  def charWindowMatches(text: String, entity: String,
      threshold: Double = Config.FuzzyWindowThreshold): List[FuzzyMatch] = {
    if (entity.isEmpty || text.isEmpty) return Nil
    val win = math.max(50, math.min(500, (2.5 * entity.length).toInt))
    val step = math.max(1, win / 2)
    val tol = math.min(20, entity.length / 4)
    val accepted = scala.collection.mutable.ListBuffer.empty[FuzzyMatch]
    var ws = 0
    while (ws < text.length) {
      val we = math.min(text.length, ws + win)
      var best: FuzzyMatch = null
      var len = math.max(1, entity.length - tol)
      val maxLen = entity.length + tol
      while (len <= maxLen) {
        var s = ws
        while (s + len <= we) {
          val cand = text.substring(s, s + len)
          val r = ratio(entity.toLowerCase, cand.toLowerCase)
          if (r >= threshold && (best == null || r > best.score))
            best = FuzzyMatch(entity, cand, s, s + len, r)
          s += 1
        }
        len += 1
      }
      if (best != null && !accepted.exists(a => a.start < best.end && best.start < a.end))
        accepted += best
      ws += step
      if (we == text.length) ws = text.length
    }
    accepted.toList.sortBy(_.start)
  }

  /** Token-window fuzzy search (check_token_based_match.py:22-58): slide an
    * entity-token-count window over the doc tokens, score the joined window
    * against the entity, map back to char offsets of first/last token.
    */
  def tokenWindowMatches(text: String, entity: String,
      threshold: Double = Config.TokenFuzzyThreshold): List[FuzzyMatch] = {
    val toks = graft.functions.Text.tokensWithPos(text)
    val eToks = graft.functions.Text.tokensWithPos(entity).map(_._1)
    if (eToks.isEmpty || toks.length < eToks.length) return Nil
    val n = eToks.length
    val target = eToks.mkString(" ")
    val out = scala.collection.mutable.ListBuffer.empty[FuzzyMatch]
    var i = 0
    while (i + n <= toks.length) {
      val windowToks = toks.slice(i, i + n)
      val window = windowToks.map(_._1).mkString(" ")
      val r = ratio(window, target)
      if (r >= threshold) {
        val start = windowToks.head._2
        val end = windowToks.last._3
        out += FuzzyMatch(entity, text.substring(start, end), start, end, r)
        i += n // skip past an accepted window (non-overlap, reference behavior)
      } else i += 1
    }
    out.toList
  }

  /** Distributed fuzzy scan: segments × (small, broadcast) entity list →
    * mentions. Narrow stage; intended as the recall pass after the exact
    * automaton scan (run it on segments the gazetteer missed).
    */
  def scan(segments: Dataset[Segment], entities: Array[(String, String)],
      threshold: Double = Config.FuzzyWindowThreshold): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(entities)
    segments.mapPartitions { it =>
      val ents = bc.value
      it.flatMap { seg =>
        ents.iterator.flatMap { case (surface, label) =>
          tokenWindowMatches(seg.text, surface).map(m =>
            Mention(seg.url, seg.page, seg.seg_no, surface, label, m.start, m.end, m.score))
        }
      }
    }
  }
}
