package graft.fuzzy

import org.apache.spark.sql.Dataset
import graft.model.{Config, Mention, Segment}
import graft.functions.Text

/** Fuzzy sliding-window similarity matching — the Spark form of the
  * reference's windowed `SequenceMatcher` joins:
  *
  *  - char windows (J5): `fuzzy_match_with_window`
  *    (/root/reference/check_fuzzy_windows_match.py:28-119) — window
  *    clamp(2.5×len, 50, 500) CENTERED on each step position, candidate
  *    lengths len±min(20, len/4) with a ≥3 floor, candidates
  *    whitespace-normalized before scoring, per-window strict-best,
  *    matched-range suppression, then a second 50 %-overlap dedup pass.
  *  - token windows (J6): `find_token_sequence`
  *    (/root/reference/check_token_based_match.py:22-58) — entity-length
  *    windows at EVERY start position, `SequenceMatcher` ratio over the
  *    token LISTS (element-level), every window ≥ threshold emitted.
  *
  * Text is row-local, so the distributed scan is a narrow `mapPartitions`
  * over segments with the (small) entity list broadcast — no shuffle. At
  * corpus scale the cost is bounded by the shared-token prefilter (an
  * entity can only token-match a window that shares ≥ ⌈threshold·n⌉ of its
  * tokens — the multiset quick bound below), so segments without entity
  * vocabulary cost one tokenize pass and nothing else.
  */
object Fuzzy {

  final case class FuzzyMatch(entity: String, matched: String, start: Int,
      end: Int, score: Double)

  // ---------------------------------------------------------------- ratio

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

  /** difflib ratio over token sequences — element-level, NOT a char ratio
    * of the joined strings (['jon','smith'] vs ['john','smith'] is 0.5
    * here and ~0.95 char-wise; the reference scores lists).
    */
  def ratioTokens(a: IndexedSeq[String], b: IndexedSeq[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = totalMatchedSeq(a, 0, a.length, b, 0, b.length)
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

  private def totalMatchedSeq(a: IndexedSeq[String], alo: Int, ahi: Int,
      b: IndexedSeq[String], blo: Int, bhi: Int): Int = {
    val (bi, bj, size) = longestMatchSeq(a, alo, ahi, b, blo, bhi)
    if (size == 0) 0
    else size +
      totalMatchedSeq(a, alo, bi, b, blo, bj) +
      totalMatchedSeq(a, bi + size, ahi, b, bj + size, bhi)
  }

  private def longestMatchSeq(a: IndexedSeq[String], alo: Int, ahi: Int,
      b: IndexedSeq[String], blo: Int, bhi: Int): (Int, Int, Int) = {
    val b2j = new java.util.HashMap[String, List[Int]]()
    var j = bhi - 1
    while (j >= blo) {
      val c = b(j)
      b2j.put(c, j :: Option(b2j.get(c)).getOrElse(Nil))
      j -= 1
    }
    var besti = alo; var bestj = blo; var bestsize = 0
    var j2len = new java.util.HashMap[Int, Int]()
    var i = alo
    while (i < ahi) {
      val newj2len = new java.util.HashMap[Int, Int]()
      var hits = Option(b2j.get(a(i))).getOrElse(Nil)
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

  // difflib's own published upper bounds, used ONLY to skip candidates that
  // provably cannot change the outcome (ub < threshold can never be emitted;
  // ub <= current best can never be strictly better): real_quick_ratio is
  // the length bound, quick_ratio the char-multiset bound.
  private def realQuickBound(la: Int, lb: Int): Double =
    if (la + lb == 0) 1.0 else 2.0 * math.min(la, lb) / (la + lb)

  private def quickBound(a: String, bCounts: java.util.HashMap[Character, Int],
      lb: Int): Double = {
    if (a.isEmpty && lb == 0) return 1.0
    val avail = new java.util.HashMap[Character, Int]()
    var m = 0; var i = 0
    while (i < a.length) {
      val c = a.charAt(i)
      val left = Option(avail.get(c))
        .getOrElse(Option(bCounts.get(c)).map(_.toInt).getOrElse(0))
      if (left > 0) { m += 1; avail.put(c, left - 1) } else avail.put(c, left)
      i += 1
    }
    2.0 * m / (a.length + lb)
  }

  private def charCounts(s: String): java.util.HashMap[Character, Int] = {
    val h = new java.util.HashMap[Character, Int]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h.put(c, Option(h.get(c)).map(_.toInt).getOrElse(0) + 1)
      i += 1
    }
    h
  }

  // ------------------------------------------------------- char windows J5

  /** Per-entity precomputed state for the char-window scan, hoisted out of
    * [[charWindowMatches]] so the distributed scan builds it once per
    * (partition, entity) instead of once per (segment, entity). Every field
    * is exactly the value the per-call code used to derive.
    */
  private[fuzzy] final class CharEntity(val entity: String) {
    val normEntity: String = Text.normWs(entity)
    val entityLen: Int = normEntity.length
    val win: Int = math.max(50, math.min(500, (entityLen * 2.5).toInt))
    val step: Int = math.max(1, win / 2)
    val entLower: String = normEntity.toLowerCase(java.util.Locale.ROOT)
    val entCounts: java.util.HashMap[Character, Int] = charCounts(entLower)
    /** ASCII histogram twin of entCounts for the allocation-free fast path
      * (chars ≥ 128 in the entity can never match an ASCII candidate char,
      * so the histogram only needs the ASCII range). */
    val entCounts128: Array[Int] = {
      val a = new Array[Int](128)
      var i = 0
      while (i < entLower.length) {
        val c = entLower.charAt(i)
        if (c < 128) a(c) += 1
        i += 1
      }
      a
    }
  }

  /** Per-text precomputed state for the char-window scan, built once per
    * segment. For pure-ASCII text (the dominant case at corpus scale) it
    * enables two EXACT-output-preserving optimizations:
    *
    *  1. a whole-text character-multiset upper bound that skips a
    *     (text, entity) pair outright when no candidate substring can reach
    *     the threshold: for any candidate with normalized length lb and
    *     multiset intersection m against the entity, m ≤ mText (candidate
    *     chars are a sub-multiset of the text's, whitespace counted as ' '
    *     since normWs only collapses runs) and quick_ratio = 2m/(la+lb) ≤
    *     2·min(mText, lb)/(la+lb), which is maximized at lb = mText, giving
    *     the pair bound 2·mText/(la+mText) ≥ every candidate's ratio;
    *  2. allocation-free candidate scoring over [lo, hi) ranges of the
    *     pre-lowercased text wherever the candidate is a fixed point of
    *     normWs (no leading/trailing whitespace, every internal whitespace
    *     char a lone ' '). ASCII makes toLowerCase per-char and
    *     context-free, so range slices of the lowered text equal the
    *     per-candidate lowercase the fallback path computes.
    *
    * Non-ASCII text takes the original substring + normWs path unchanged
    * (String.toLowerCase is context-sensitive — e.g. final sigma — and can
    * change lengths, so none of the range arithmetic is safe there).
    */
  private[fuzzy] final class CharText(val text: String) {
    val ascii: Boolean = {
      var i = 0; var a = true
      while (a && i < text.length) { if (text.charAt(i) >= 128) a = false; i += 1 }
      a
    }
    val lower: String = if (ascii) text.toLowerCase(java.util.Locale.ROOT) else null
    private val ws: Array[Boolean] = if (!ascii) null else {
      val a = new Array[Boolean](text.length)
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        a(i) = Character.isWhitespace(c) || Character.isSpaceChar(c)
        i += 1
      }
      a
    }
    // badPrefix(i) = #positions < i that break normWs identity: a ws char
    // that is not a lone ' ' (non-space ws, or ws followed by ws)
    private val badPrefix: Array[Int] = if (!ascii) null else {
      val a = new Array[Int](text.length + 1)
      var i = 0
      while (i < text.length) {
        val bad = ws(i) && (text.charAt(i) != ' ' || (i + 1 < text.length && ws(i + 1)))
        a(i + 1) = a(i) + (if (bad) 1 else 0)
        i += 1
      }
      a
    }
    /** candidate [lo, hi) is a fixed point of normWs (ASCII text only): no
      * leading/trailing ws and no internal identity-breaking ws position
      * (internal positions are [lo+1, hi-2], whose lookahead stays inside
      * the candidate because hi-1 is non-ws). */
    def normIdentity(lo: Int, hi: Int): Boolean =
      !ws(lo) && !ws(hi - 1) && badPrefix(hi - 1) - badPrefix(lo) == 0
    /** Lowered-text histogram with every ws char counted as ' ' — an upper
      * bound on any normWs'd candidate's char counts. */
    val counts128: Array[Int] = if (!ascii) null else {
      val a = new Array[Int](128)
      var i = 0
      while (i < text.length) {
        a(if (ws(i)) ' ' else lower.charAt(i)) += 1
        i += 1
      }
      a
    }
  }

  /** Char-window fuzzy search of one entity in one text — faithful
    * `fuzzy_match_with_window` (check_fuzzy_windows_match.py:28-119):
    * step positions i = 0, step, … ≤ len(text)−len(entity); window =
    * [i−win/2, i+len(entity)+win/2); candidates at exact entity length plus
    * every length delta in ±min(20, len/4) with adjusted length ≥ 3;
    * score = ratio(lower(normWs(entity)), lower(normWs(candidate)));
    * strict-best per window (first wins ties); accepted ranges suppress
    * overlapping later windows; final pass drops matches overlapping a kept
    * match by more than 50 % of the shorter length.
    *
    * Known divergence: [[ratio]] omits difflib's autojunk heuristic, while
    * the reference scores with `SequenceMatcher(None, a, b)` (autojunk ON).
    * Autojunk only activates when the SECOND argument — here the normalized
    * candidate, bounded by window length ≤ 500 — reaches 200+ chars, i.e.
    * for entities longer than ~180 chars; scores can then differ from
    * CPython's. Harmless for realistic entity surfaces (the gazetteer tops
    * out at 21 chars) but a stated fidelity boundary of the general API.
    */
  def charWindowMatches(text: String, entity: String,
      threshold: Double = Config.FuzzyWindowThreshold): List[FuzzyMatch] =
    charWindowMatchesPre(new CharText(text), new CharEntity(entity), threshold)

  /** [[charWindowMatches]] over precomputed per-text / per-entity state —
    * the distributed scan's form. Output is identical to the historical
    * per-call implementation: the ASCII fast path only (a) skips pairs whose
    * whole-text bound proves no candidate can reach the threshold and
    * (b) scores normWs-fixed-point candidates over index ranges instead of
    * fresh substrings; every pruning predicate and tie-break is unchanged.
    */
  private[fuzzy] def charWindowMatchesPre(ct: CharText, ce: CharEntity,
      threshold: Double): List[FuzzyMatch] = {
    val text = ct.text
    val entityLen = ce.entityLen
    if (entityLen == 0 || text.isEmpty || text.length < entityLen) return Nil
    val win = ce.win
    val step = ce.step
    val entLower = ce.entLower
    val entCounts = ce.entCounts
    val la = entLower.length
    val fast = ct.ascii

    if (fast) {
      // Whole-pair multiset bound (see CharText scaladoc): skip the entity
      // when NO candidate anywhere in the text can reach the threshold.
      var mText = 0
      var c = 0
      while (c < 128) { mText += math.min(ce.entCounts128(c), ct.counts128(c)); c += 1 }
      if (2.0 * mText / (la + mText) < threshold) return Nil
    }
    // quickBound scratch for the range path: per-candidate histogram reset
    // via generation stamps, no per-candidate allocation
    val avail = if (fast) new Array[Int](128) else null
    val stamp = if (fast) new Array[Int](128) else null
    var gen = 0

    def sim(candidate: String, bestScore: Double): Double = {
      val candLower = Text.normWs(candidate).toLowerCase(java.util.Locale.ROOT)
      val lb = candLower.length
      // prune: candidates whose upper bound is < threshold can never be
      // emitted; <= bestScore can never strictly beat the current best —
      // identical accepted output, orders of magnitude fewer full ratios.
      val rq = realQuickBound(la, lb)
      if (rq < threshold || rq <= bestScore) return -1.0
      val q = quickBound(candLower, entCounts, la)
      if (q < threshold || q <= bestScore) return -1.0
      ratio(entLower, candLower)
    }

    /** sim over the normWs-fixed-point range [lo, hi) of ct.lower — same
      * bounds, same pruning, same ratio as [[sim]] on the equal string. */
    def simRange(lo: Int, hi: Int, bestScore: Double): Double = {
      val lb = hi - lo
      val rq = realQuickBound(la, lb)
      if (rq < threshold || rq <= bestScore) return -1.0
      gen += 1
      var m = 0
      var i = lo
      val lower = ct.lower
      while (i < hi) {
        val ch = lower.charAt(i)
        if (stamp(ch) != gen) { avail(ch) = ce.entCounts128(ch); stamp(ch) = gen }
        if (avail(ch) > 0) { m += 1; avail(ch) -= 1 }
        i += 1
      }
      val q = 2.0 * m / (lb + la)
      if (q < threshold || q <= bestScore) return -1.0
      2.0 * totalMatched(entLower, 0, la, lower, lo, hi) / (la + lb)
    }

    val matchedRanges = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    val matches = scala.collection.mutable.ListBuffer.empty[FuzzyMatch]
    var i = 0
    while (i <= text.length - entityLen) {
      val wStart = math.max(0, i - win / 2)
      val wEnd = math.min(text.length, i + entityLen + win / 2)
      var bestScore = 0.0
      var bestLo = -1
      var bestHi = -1
      // one candidate [lo, lo+len): range-scored when possible, else the
      // substring fallback — identical scores either way
      def consider(lo: Int, len: Int): Unit = {
        val hi = lo + len
        val score =
          if (fast && ct.normIdentity(lo, hi)) simRange(lo, hi, bestScore)
          else sim(text.substring(lo, hi), bestScore)
        if (score > bestScore) { bestScore = score; bestLo = lo; bestHi = hi }
      }
      // scan 1: candidates at exact entity length
      var j = wStart
      while (j + entityLen <= wEnd) { consider(j, entityLen); j += 1 }
      // scan 2: length deltas (delta 0 is scan 1 again — a re-score of the
      // same candidates can never be STRICTLY better, so it is skipped)
      val tol = math.min(20, entityLen / 4)
      var delta = -tol
      while (delta <= tol) {
        val adjLen = entityLen + delta
        if (delta != 0 && adjLen >= 3) {
          var j2 = wStart
          while (j2 + adjLen <= wEnd) { consider(j2, adjLen); j2 += 1 }
        }
        delta += 1
      }
      if (bestScore >= threshold && bestLo >= 0) {
        val overlapping = matchedRanges.exists { case (s, e) => !(bestLo >= e || bestHi <= s) }
        if (!overlapping) {
          matches += FuzzyMatch(ce.entity, text.substring(bestLo, bestHi),
            bestLo, bestHi, bestScore)
          matchedRanges += ((bestLo, bestHi))
        }
      }
      i += step
    }
    // final 50%-overlap dedup, in start order
    val sorted = matches.sortBy(_.start)
    val finalMatches = scala.collection.mutable.ListBuffer.empty[FuzzyMatch]
    sorted.foreach { m =>
      val dup = finalMatches.exists { ex =>
        val os = math.max(m.start, ex.start)
        val oe = math.min(m.end, ex.end)
        val ol = math.max(0, oe - os)
        ol > math.min(m.matched.length, ex.matched.length) * 0.5
      }
      if (!dup) finalMatches += m
    }
    finalMatches.toList
  }

  // ------------------------------------------------------ token windows J6

  /** Per-entity precomputed token state (token list + multiset counts) for
    * the token matchers — hoisted so the distributed scans build it once per
    * (partition, entity) instead of once per (segment, entity) call.
    */
  private[graft] final class TokenEntity(val entity: String) {
    val toks: Vector[String] = Text.tokensWithPos(entity).map(_._1)
    val counts: java.util.HashMap[String, Int] = {
      val h = new java.util.HashMap[String, Int]()
      toks.foreach(t => h.put(t, Option(h.get(t)).map(_.toInt).getOrElse(0) + 1))
      h
    }
  }

  /** Whole-text token histogram, built once per segment for the pair-level
    * prefilter below. */
  private[graft] def tokenCounts(toks: IndexedSeq[(String, Int, Int)])
      : java.util.HashMap[String, Int] = {
    val h = new java.util.HashMap[String, Int]()
    toks.foreach { case (t, _, _) =>
      h.put(t, Option(h.get(t)).map(_.toInt).getOrElse(0) + 1)
    }
    h
  }

  /** EXACT-output-preserving pair skip for the token matchers: a window's
    * shared-token count (the matcher's quick gate) can never exceed the
    * whole text's Σ_t min(entityCount(t), textCount(t)); when even that
    * bound sits below ⌈threshold·n⌉ the matcher provably emits nothing, so
    * the (text, entity) pair costs O(|entity tokens|) instead of a sliding
    * counter pass over every text token. Applies to the windowed (GLiNER)
    * form too — a window's token multiset is a sub-multiset of the text's.
    */
  private[graft] def tokenPairPossible(textCounts: java.util.HashMap[String, Int],
      te: TokenEntity, threshold: Double): Boolean = {
    val n = te.toks.length
    if (n == 0) return false // matcher returns Nil for token-free entities
    var m = 0
    val it = te.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // absent key null-unboxes to 0, which min() then zeroes out
      m += math.min(e.getValue, textCounts.get(e.getKey))
    }
    m.toDouble / n >= threshold
  }

  /** Token-window fuzzy search — faithful `find_token_sequence` +
    * `find_entity_spans_token_based` (check_token_based_match.py:22-58):
    * entity-token-count windows at EVERY start position (no skip after an
    * accepted window), element-level difflib ratio over the token lists,
    * every window ≥ threshold emitted with char offsets of first/last token.
    * A multiset quick bound (shared-token count / n, an upper bound on the
    * list ratio) gates the full ratio — output identical, and windows that
    * share too few tokens cost O(1).
    */
  def tokenWindowMatches(text: String, entity: String,
      threshold: Double = Config.TokenFuzzyThreshold): List[FuzzyMatch] =
    tokenWindowMatchesPre(Text.tokensWithPos(text), text, new TokenEntity(entity),
      threshold)

  /** [[tokenWindowMatches]] over pre-tokenized text and precomputed entity
    * state — the distributed scans' form (text tokenization and the entity
    * token multiset are entity- and segment-invariant respectively, so the
    * per-call version recomputed both |entities| × |segments| times).
    * `counts` is only read, never mutated, so one [[TokenEntity]] is safe
    * to share across calls and threads after construction.
    */
  private[graft] def tokenWindowMatchesPre(toks: IndexedSeq[(String, Int, Int)],
      text: String, te: TokenEntity,
      threshold: Double): List[FuzzyMatch] = {
    val entity = te.entity
    val eToks = te.toks
    val n = eToks.length
    if (n == 0 || toks.length < n) return Nil
    val eCounts = te.counts
    // sliding multiset-intersection counter: shared(i) = |window(i) ∩ eToks|
    val inWin = new java.util.HashMap[String, Int]()
    var shared = 0
    def add(t: String): Unit = {
      val c = Option(inWin.get(t)).map(_.toInt).getOrElse(0)
      if (c < Option(eCounts.get(t)).map(_.toInt).getOrElse(0)) shared += 1
      inWin.put(t, c + 1)
    }
    def remove(t: String): Unit = {
      val c = inWin.get(t)
      if (c - 1 < Option(eCounts.get(t)).map(_.toInt).getOrElse(0)) shared -= 1
      inWin.put(t, c - 1)
    }
    (0 until n).foreach(k => add(toks(k)._1))
    val out = scala.collection.mutable.ListBuffer.empty[FuzzyMatch]
    var i = 0
    while (i + n <= toks.length) {
      if (shared.toDouble / n >= threshold) {
        val windowToks = toks.slice(i, i + n)
        val r = ratioTokens(windowToks.map(_._1), eToks)
        if (r >= threshold) {
          val start = windowToks.head._2
          val end = windowToks.last._3
          out += FuzzyMatch(entity, text.substring(start, end), start, end, r)
        }
      }
      if (i + n < toks.length) { remove(toks(i)._1); add(toks(i + n)._1) }
      i += 1
    }
    out.toList
  }

  // --------------------------------------------- M4 GLiNER sliding windows

  /** GLiNER-style sliding windows with `last_slide_end_index` rebase
    * (/root/reference/src/methods/GLiNERModel.py:56-75): windows of
    * `Config.SlideWindow` tokens advancing by `Config.SlideStep`; each
    * window pairs with the char offset of its first token in the
    * SPACE-JOINED token stream — the coordinate the reference rebases
    * window-local entity offsets into. Returns (windowText, rebaseOffset).
    */
  def slidingWindows(tokens: IndexedSeq[String],
      window: Int = Config.SlideWindow,
      slide: Int = Config.SlideStep): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var lastSlideEnd = 0
    var i = 0
    while (i < tokens.length) {
      val windowText = tokens.slice(i, i + window).mkString(" ")
      out += ((windowText, lastSlideEnd))
      val slideText = tokens.slice(i, i + slide).mkString(" ")
      lastSlideEnd += slideText.length + 1
      i += slide
    }
    out.result()
  }

  /** M4 composition: windowed scan in joined-token coordinates — windows →
    * per-window token match → offset rebase → exact-duplicate drop
    * (find_unique_dicts, GLiNERModel.py:25-30) → leftmost-longest overlap
    * resolution (remove_overlapping_entities, GLiNERModel.py:33-44).
    * Overlapping windows (window > slide) guarantee any span of ≤ slide
    * tokens lands fully inside some window; the rebase makes duplicate
    * detections collapse to identical global offsets.
    */
  def windowedTokenScan(text: String, entity: String,
      threshold: Double = Config.TokenFuzzyThreshold): List[FuzzyMatch] =
    windowedTokenScanPre(
      slidingWindowsPre(Text.tokensWithPos(text).map(_._1)),
      new TokenEntity(entity), threshold)

  /** [[slidingWindows]] plus each window's own tokenization — the windows
    * and their token lists depend only on the TEXT, so the distributed scan
    * computes them once per segment and reuses them for every entity (the
    * per-call form re-built and re-tokenized every window per entity).
    */
  private[fuzzy] def slidingWindowsPre(tokens: IndexedSeq[String])
      : Vector[(String, Int, Vector[(String, Int, Int)])] =
    slidingWindows(tokens).map { case (wt, off) =>
      (wt, off, Text.tokensWithPos(wt))
    }

  /** [[windowedTokenScan]] over precomputed windows — identical per-entity
    * match → rebase → distinct → leftmost-longest pipeline. */
  private[fuzzy] def windowedTokenScanPre(
      wins: Vector[(String, Int, Vector[(String, Int, Int)])],
      te: TokenEntity, threshold: Double): List[FuzzyMatch] = {
    val all = wins.flatMap { case (wt, off, wtoks) =>
      tokenWindowMatchesPre(wtoks, wt, te, threshold)
        .map(m => m.copy(start = m.start + off, end = m.end + off))
    }
    val unique = all.distinct.sortBy(m => (m.start, -(m.end - m.start)))
    var lastEnd = -1
    unique.filter { m =>
      if (m.start >= lastEnd) { lastEnd = m.end; true } else false
    }.toList
  }

  // --------------------------------------------------------- distributed

  /** Fuzzy-recall test corpus: one segment per document — normalized doc
    * text + planted `" Witness: <variant>."` where variant = person
    * (doc_id·7 mod |persons|) rendered in style doc_id mod 4 (0 lowercase,
    * 1 first space → ", ", 2 UPPERCASE, 3 first space → "-" plus a
    * trailing "'s" — the P8 hyphen/possessive normalization shapes,
    * check_fuzzy_match.py:18-20,48-50). All four styles are invisible to
    * the case-sensitive exact automaton; the token matcher recovers each at
    * ratio 1.0 (tokens are lowercased, punctuation-free, so the hyphen
    * splits and the possessive becomes a trailing "s" token outside the
    * matched window). Plant arithmetic is mirrored by Oracle.qFuzzy.
    */
  def fuzzySegments(spark: org.apache.spark.sql.SparkSession, sfDir: String): Dataset[Segment] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Plant-arithmetic oracle precondition (digit-free, bigram-free base
    // corpus) — fail fast on a corpus where qFuzzy/qGlinerWindows would
    // silently hash-mismatch. Memoized: one scan per session.
    graft.verify.CorpusAsserts.assertPlantSafe(spark, sfDir)
    val nP = graft.model.Gazetteer.persons.length
    graft.util.Reads.spread(spark,
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), regexp_replace(trim(col("text")), "\\s+", " ").as("text")))
      .as[(Long, String)]
      .map { case (id, base) =>
        val p = graft.model.Gazetteer.persons(((id * 7) % nP).toInt)
        val v = (id % 4) match {
          case 0 => p.toLowerCase(java.util.Locale.ROOT)
          case 1 => p.replaceFirst(" ", ", ")
          case 2 => p.toUpperCase(java.util.Locale.ROOT)
          case _ => p.replaceFirst(" ", "-") + "'s"
        }
        Segment(id.toString, 0, 0, "Text", s"$base Witness: $v.")
      }
  }

  /** Char-window fuzzy test corpus: ONE-SENTENCE segments
    * `"Witness: <variant>."` (same person arithmetic as [[fuzzySegments]]
    * but INTENTIONALLY its own 3-style variant table — Oracle.qFuzzyChar
    * hard-codes `doc_id % 3` and styles 0..2, so "aligning" this to
    * fuzzySegments' 4-style table would silently break the J5 oracle; the
    * two generators diverge on purpose). With sentence length ≪ the 50-char
    * minimum window, every window covers the whole sentence, so the
    * reference's J5 semantics collapse to a per-entity best-candidate
    * enumeration — which Oracle.qFuzzyChar performs directly.
    */
  def fuzzyCharSegments(spark: org.apache.spark.sql.SparkSession, sfDir: String): Dataset[Segment] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nP = graft.model.Gazetteer.persons.length
    graft.util.Reads.spread(spark,
        spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")))
      .as[Long]
      .map { id =>
        val p = graft.model.Gazetteer.persons(((id * 7) % nP).toInt)
        val v = (id % 3) match {
          case 0 => p.toLowerCase(java.util.Locale.ROOT)
          case 1 => p.replaceFirst(" ", ", ")
          case _ => p.toUpperCase(java.util.Locale.ROOT)
        }
        Segment(id.toString, 0, 0, "Text", s"Witness: $v.")
      }
  }

  /** Distributed M4 windowed token scan (the GLiNER 20/10 window + rebase
    * shape at scale): same narrow broadcast-mapPartitions shape as [[scan]],
    * running [[windowedTokenScan]] per (segment, entity). Offsets are in the
    * JOINED-token coordinate system — the reference's coordinates after its
    * own `last_slide_end_index` rebase (GLiNERModel.py:56-95).
    */
  def scanWindowed(segments: Dataset[Segment], entities: Array[(String, String)],
      threshold: Double = Config.TokenFuzzyThreshold): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(entities)
    segments.mapPartitions { it =>
      // per-partition entity state; per-segment window construction +
      // tokenization — both were per (segment, entity) before
      val ents = bc.value.map { case (s, l) => (s, l, new TokenEntity(s)) }
      it.flatMap { seg =>
        val toks = Text.tokensWithPos(seg.text)
        val counts = tokenCounts(toks)
        // windows built lazily: a segment all of whose entities fail the
        // pair bound never pays window construction at all
        lazy val wins = slidingWindowsPre(toks.map(_._1))
        ents.iterator.flatMap { case (surface, label, te) =>
          if (!tokenPairPossible(counts, te, threshold)) Nil
          else windowedTokenScanPre(wins, te, threshold).map(m =>
            Mention(seg.url, seg.page, seg.seg_no, surface, label, m.start, m.end, m.score))
        }
      }
    }
  }

  /** Distributed char-window fuzzy scan (J5 at scale): same narrow shape as
    * [[scan]], with the full fuzzy_match_with_window semantics per
    * (segment, entity).
    */
  def scanChar(segments: Dataset[Segment], entities: Array[(String, String)],
      threshold: Double = Config.FuzzyWindowThreshold): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(entities)
    segments.mapPartitions { it =>
      // per-partition entity state; per-segment text state (lowercase,
      // whitespace/identity prefix sums, char histogram) — the multiset
      // prefilter in charWindowMatchesPre then skips most (segment, entity)
      // pairs in O(|alphabet|) instead of scanning every window
      val ents = bc.value.map { case (s, l) => (s, l, new CharEntity(s)) }
      it.flatMap { seg =>
        val ct = new CharText(seg.text)
        ents.iterator.flatMap { case (surface, label, ce) =>
          charWindowMatchesPre(ct, ce, threshold).map(m =>
            Mention(seg.url, seg.page, seg.seg_no, surface, label, m.start, m.end, m.score))
        }
      }
    }
  }

  /** Distributed fuzzy scan: segments × (small, broadcast) entity list →
    * mentions (token-window matcher, the reference's recall pass for
    * entities the exact automaton missed). Narrow stage; the per-entity
    * shared-token bound inside [[tokenWindowMatches]] makes segments without
    * entity vocabulary cost one tokenize pass.
    */
  def scan(segments: Dataset[Segment], entities: Array[(String, String)],
      threshold: Double = Config.TokenFuzzyThreshold): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(entities)
    segments.mapPartitions { it =>
      // per-partition entity token state; per-segment tokenization — both
      // were recomputed per (segment, entity) call before
      val ents = bc.value.map { case (s, l) => (s, l, new TokenEntity(s)) }
      it.flatMap { seg =>
        val toks = Text.tokensWithPos(seg.text)
        val counts = tokenCounts(toks)
        ents.iterator.flatMap { case (surface, label, te) =>
          if (!tokenPairPossible(counts, te, threshold)) Nil
          else tokenWindowMatchesPre(toks, seg.text, te, threshold).map(m =>
            Mention(seg.url, seg.page, seg.seg_no, surface, label, m.start, m.end, m.score))
        }
      }
    }
  }
}
