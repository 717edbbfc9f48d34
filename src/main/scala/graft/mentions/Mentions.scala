package graft.mentions

import org.apache.spark.sql.{Column, Dataset, functions}
import graft.model.{Mention, Segment}

/** Gazetteer mention detection + overlap resolution.
  *
  * Replaces the reference's per-segment NER backends (SURVEY §2.8 M1-M5)
  * with a deterministic broadcast-automaton scan: one narrow `mapPartitions`
  * stage, no shuffle, whole pipeline scales with input splits. The automaton
  * is built from the broadcast surface list once per executor
  * ([[AhoCorasick.cached]]), mirroring "broadcast model + batched
  * mapPartitions" (SURVEY §2.8).
  */
object Mentions {

  /** Scan segments for gazetteer surfaces; spans resolved per segment with
    * the reference's leftmost-longest rule before emission.
    *
    * @param gazetteer (surface, label) dimension rows; broadcast implicitly
    *                  via task closure (small) — swap for an explicit
    *                  `SparkContext.broadcast` when the dimension grows.
    */
  def scan(segments: Dataset[Segment], gazetteer: Array[(String, String)]): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    segments.mapPartitions { it =>
      val gaz = bc.value
      val ac = AhoCorasick.cached(gaz.map(_._1))
      it.flatMap { seg =>
        val raw = ac.scan(seg.text).map { case (p, s, e) =>
          Mention(seg.url, seg.page, seg.seg_no, gaz(p)._1, gaz(p)._2, s, e, 1.0)
        }
        resolveOverlaps(raw)
      }
    }
  }

  /** Exact scan + fuzzy recall — the flagship mention flow: the broadcast
    * automaton runs first; ONLY segments with zero exact hits go to the
    * token-fuzzy matcher, and only against entities sharing ≥1 token with
    * the segment (lossless prefilter: a window at ratio ≥ threshold ≥ 0.5
    * must share at least one token). Still one narrow mapPartitions stage —
    * no shuffle; on a corpus where the gazetteer hits exactly, the recall
    * branch costs one tokenize pass per missed segment. The fuzzy path
    * itself is driver-verified by q_fuzzy's planted-variant oracle.
    */
  def scanWithRecall(segments: Dataset[Segment], gazetteer: Array[(String, String)],
      fuzzyThreshold: Double = graft.model.Config.TokenFuzzyThreshold): Dataset[Mention] = {
    val spark = segments.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    segments.mapPartitions { it =>
      val gaz = bc.value
      val ac = AhoCorasick.cached(gaz.map(_._1))
      val tokenIndex = Mentions.cachedTokenIndex(gaz)
      it.flatMap(seg => scanSegment(seg, gaz, ac, tokenIndex, fuzzyThreshold))
    }
  }

  /** One segment's exact+recall mention scan (the per-row core of
    * [[scanWithRecall]]) — factored out so the streaming flagship can run
    * the identical logic inside its fused per-page stage
    * (graft.streaming.Streaming.pageTriples) without a second copy of the
    * exact-first / fuzzy-recall policy.
    */
  def scanSegment(seg: Segment, gaz: Array[(String, String)], ac: AhoCorasick,
      tokenIndex: Map[String, List[Int]], fuzzyThreshold: Double): List[Mention] = {
    val raw = ac.scan(seg.text).map { case (p, s, e) =>
      Mention(seg.url, seg.page, seg.seg_no, gaz(p)._1, gaz(p)._2, s, e, 1.0)
    }
    if (raw.nonEmpty) resolveOverlaps(raw)
    else {
      val segToks = graft.functions.Text.tokensWithPos(seg.text)
      val cands = segToks.iterator.map(_._1)
        .flatMap(t => tokenIndex.getOrElse(t, Nil)).toSet
      if (cands.isEmpty) Nil
      else {
        // segment tokens are already in hand and the per-entity token state
        // is executor-cached — the fuzzy recall pass re-tokenizes nothing;
        // the pair bound skips candidates that share a token but provably
        // too few of them to reach the threshold anywhere
        val ents = cachedEntityToks(gaz)
        val counts = graft.fuzzy.Fuzzy.tokenCounts(segToks)
        resolveOverlaps(cands.toList.sorted.flatMap { gi =>
          if (!graft.fuzzy.Fuzzy.tokenPairPossible(counts, ents(gi), fuzzyThreshold)) Nil
          else graft.fuzzy.Fuzzy.tokenWindowMatchesPre(segToks, seg.text, ents(gi),
              fuzzyThreshold)
            .map(m => Mention(seg.url, seg.page, seg.seg_no,
              gaz(gi)._1, gaz(gi)._2, m.start, m.end, m.score))
        })
      }
    }
  }

  // Executor-local cache of per-entity token state (same discipline and
  // rationale as cachedTokenIndex below): TokenEntity is read-only after
  // construction, so sharing one instance across tasks/threads is safe.
  private val entityToksCache =
    new graft.util.ContentKeyedCache[Array[graft.fuzzy.Fuzzy.TokenEntity]]()

  private[graft] def cachedEntityToks(
      gaz: Array[(String, String)]): Array[graft.fuzzy.Fuzzy.TokenEntity] =
    entityToksCache.get(gaz)(g => g.map { case (s, _) =>
      new graft.fuzzy.Fuzzy.TokenEntity(s) })

  // Executor-local cache of the gazetteer token index (token → entity
  // indices): at a 100k-surface dimension the index is ~200k entries, and
  // rebuilding it per TASK (the previous behavior) costs real time once a
  // job runs millions of tasks — the automaton was amortized, the index was
  // not. The collision-confirmed, size-bounded discipline lives in
  // graft.util.ContentKeyedCache (shared with AhoCorasick.cached).
  private val tokenIndexCache =
    new graft.util.ContentKeyedCache[Map[String, List[Int]]]()

  private[graft] def cachedTokenIndex(gaz: Array[(String, String)]): Map[String, List[Int]] =
    tokenIndexCache.get(gaz)(g => g.indices.toList
      .flatMap(i => graft.functions.Text.tokensWithPos(g(i)._1).map(_._1 -> i))
      .groupMap(_._1)(_._2))

  /** Greedy non-overlap selection — the reference's
    * `remove_overlapping_entities` (OllamaNERExtractor.py:101-112, 6 dupes):
    * sort by (start asc, length desc), keep a span iff it starts at/after
    * the last kept end. Pure list-local: applied inside the scan stage (no
    * shuffle) or per-group via [[resolveAcrossExtractors]].
    *
    * The reference's Python sort is stable on INPUT order, which makes
    * identical-span ties order-dependent — unacceptable once mentions from
    * independent extractors union through a shuffle (row order is not
    * deterministic). The sort key is therefore totalized with (label,
    * surface): same-span ties resolve to the lexicographically smallest
    * surface, deterministically, on any input permutation.
    */
  def resolveOverlaps(ms: List[Mention]): List[Mention] = {
    val sorted = ms.sortBy(m => (m.start, -(m.end - m.start), m.label, m.surface))
    var lastEnd = -1
    sorted.filter { m =>
      if (m.start >= lastEnd) { lastEnd = m.end; true } else false
    }
  }

  /** Resolution across already-materialized mention sets (ensemble union,
    * SURVEY §2.6 O7+O3): group by segment, resolve within group. Needs a
    * shuffle on (url, page, seg_no) — used only when mentions come from
    * independent extractor outputs.
    */
  def resolveAcrossExtractors(mentions: Dataset[Mention]): Dataset[Mention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions
      .groupByKey(m => (m.url, m.page, m.seg_no))
      .flatMapGroups((_, it) => resolveOverlaps(it.toList))
  }

  /** F5 provenance-drift predicate (the q_mentions hard `require` rides
    * this): true when a mention row's span coordinates have drifted from
    * its surface string. A row is a violation when
    *  - its offsets fall outside the segment, or
    *  - score == 1.0 and the slice is not the surface VERBATIM and either
    *     (a) the slice's tokenKey differs from the surface's (drift into
    *         word characters — extra/changed tokens), or
    *     (b) the slice does not start AND end on a word character (drift
    *         into adjacent punctuation/whitespace, which tokenKey alone
    *         cannot see).
    * Both legitimate score-1.0 producers pass: exact automaton hits slice
    * verbatim (whatever characters the surface contains), and token-fuzzy
    * ratio-1.0 hits span first-token-start to last-token-end (word-char
    * aligned by construction) with an equal tokenKey.
    */
  def provenanceViolation(text: Column, start: Column, end: Column,
      surface: Column, score: Column): Column = {
    import graft.functions.expressions.tokenkey
    // The tokenizer's word-char class: letters, decimal digits, underscore
    // (Text.isWordChar = Character.isLetterOrDigit || '_').
    val wordChar = "[\\p{L}\\p{Nd}_]"
    val slice = text.substr(start + functions.lit(1), end - start)
    start < 0 || start >= end || end > functions.length(text) ||
      (score === 1.0 && slice =!= surface && (
        tokenkey(slice) =!= tokenkey(surface) ||
        !text.substr(start + functions.lit(1), functions.lit(1)).rlike(wordChar) ||
        !text.substr(end, functions.lit(1)).rlike(wordChar)))
  }
}
