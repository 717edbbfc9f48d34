package graft.mentions

import scala.collection.mutable

/** Multi-pattern string automaton for the gazetteer mention scan — the
  * scalable replacement of the reference's per-entity regex/`str.find`
  * searches (check_fuzzy_match.py:9-42, DateParser.py:19-31): one pass over
  * the text finds all occurrences of all patterns.
  *
  * Classic Aho-Corasick (public algorithm, Aho & Corasick 1975): trie +
  * BFS-built failure links + output lists. Built once per executor from the
  * broadcast pattern list (build cost amortized across partitions via
  * [[AhoCorasick.cached]]), then each text scan is O(text + matches).
  */
final class AhoCorasick private (patterns: Array[String]) {
  // Build-time node storage: growable arrays; children as per-node HashMap
  // (pattern set is a dimension table — thousands at most — so build memory
  // is trivial). After the BFS the trie is FROZEN into primitive arrays for
  // the scan loop (below): the per-char HashMap lookup boxed every text
  // char and was the single hottest call of the flagship's scan stage.
  private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val out = mutable.ArrayBuffer[List[Int]](Nil)

  locally {
    var p = 0
    while (p < patterns.length) {
      var node = 0
      val s = patterns(p)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        node = children(node).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Char, Int]
          fail += 0
          out += Nil
          children.length - 1
        })
        i += 1
      }
      out(node) = p :: out(node)
      p += 1
    }
    // BFS failure links
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { v => fail(v) = 0; queue.enqueue(v) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v) children(f)(c) else 0
        out(v) = out(v) ::: out(fail(v))
        queue.enqueue(v)
      }
    }
  }

  // ---- frozen scan-time representation (same automaton, no boxing) ------
  // Root transitions as a direct char-indexed table (most scan positions
  // sit at the root — a text char that starts no pattern costs ONE array
  // read); inner nodes keep (sorted-char, target) parallel arrays with a
  // linear probe over their tiny fanout. -1 = no transition.
  private val rootNext: Array[Int] = {
    val a = Array.fill(Char.MaxValue + 1)(-1)
    children(0).foreach { case (c, v) => a(c) = v }
    a
  }
  private val childChars: Array[Array[Char]] = children.map { m =>
    m.keysIterator.toArray.sorted
  }.toArray
  private val childTargets: Array[Array[Int]] = children.zipWithIndex.map {
    case (m, i) => childChars(i).map(m)
  }.toArray
  private val failA: Array[Int] = fail.toArray
  private val outA: Array[Array[Int]] = out.map(_.toArray).toArray
  private val patLen: Array[Int] = patterns.map(_.length)
  private val nNodes: Int = children.length
  locally {
    // the frozen arrays fully replace the build-time structures — release
    // them so a cached 100k-surface automaton holds primitive arrays, not
    // a HashMap per node
    children.clear(); fail.clear(); out.clear()
  }

  @inline private def transition(node: Int, c: Char): Int =
    if (node == 0) rootNext(c)
    else {
      val cs = childChars(node)
      var j = 0
      while (j < cs.length && cs(j) != c) j += 1
      if (j < cs.length) childTargets(node)(j) else -1
    }

  /** All matches as (patternIndex, start, endExclusive). `wordBounds`
    * requires non-word chars (or string edges) around the match, so
    * "Article 12" does not fire inside "Article 128".
    */
  def scan(text: String, wordBounds: Boolean = true): List[(Int, Int, Int)] = {
    var acc: List[(Int, Int, Int)] = Nil
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      // identical automaton semantics to the HashMap form: follow failure
      // links until a transition exists or the root rejects
      var next = transition(node, c)
      while (next < 0 && node != 0) { node = failA(node); next = transition(node, c) }
      node = if (next < 0) 0 else next
      val hits = outA(node)
      if (hits.length != 0) {
        var h = 0
        while (h < hits.length) {
          val p = hits(h)
          val start = i + 1 - patLen(p)
          if (!wordBounds || (boundaryBefore(text, start) && boundaryAfter(text, i + 1)))
            acc = (p, start, i + 1) :: acc
          h += 1
        }
      }
      i += 1
    }
    acc.reverse
  }

  /** Trie node count — memory is O(nodeCount); bounded above by
    * Σ|pattern| + 1 (each pattern char creates at most one node), which
    * GazetteerScaleSpec asserts at the 100k-surface dimension.
    */
  def nodeCount: Int = nNodes

  @inline private def boundaryBefore(t: String, start: Int): Boolean =
    start == 0 || !Character.isLetterOrDigit(t.charAt(start - 1))
  @inline private def boundaryAfter(t: String, end: Int): Boolean =
    end == t.length || !Character.isLetterOrDigit(t.charAt(end))
}

object AhoCorasick {
  def apply(patterns: Array[String]): AhoCorasick = new AhoCorasick(patterns)

  // Executor-local cache keyed by pattern content: mapPartitions tasks on
  // the same executor reuse one automaton instead of rebuilding. The
  // collision-confirmed, size-bounded discipline lives in
  // graft.util.ContentKeyedCache (shared with Mentions.cachedTokenIndex).
  private val cache = new graft.util.ContentKeyedCache[AhoCorasick]()
  def cached(patterns: Array[String]): AhoCorasick =
    cache.get(patterns)(new AhoCorasick(_))
}
