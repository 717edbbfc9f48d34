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
  // Node storage: growable arrays; children as per-node HashMap (pattern set
  // is a dimension table — thousands at most — so build memory is trivial).
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

  /** All matches as (patternIndex, start, endExclusive). `wordBounds`
    * requires non-word chars (or string edges) around the match, so
    * "Article 12" does not fire inside "Article 128".
    */
  def scan(text: String, wordBounds: Boolean = true): List[(Int, Int, Int)] = {
    var acc: List[(Int, Int, Int)] = Nil
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (node != 0 && !children(node).contains(c)) node = fail(node)
      node = children(node).getOrElse(c, 0)
      var hits = out(node)
      while (hits.nonEmpty) {
        val p = hits.head
        val start = i + 1 - patterns(p).length
        if (!wordBounds || (boundaryBefore(text, start) && boundaryAfter(text, i + 1)))
          acc = (p, start, i + 1) :: acc
        hits = hits.tail
      }
      i += 1
    }
    acc.reverse
  }

  /** Trie node count — memory is O(nodeCount); bounded above by
    * Σ|pattern| + 1 (each pattern char creates at most one node), which
    * GazetteerScaleSpec asserts at the 100k-surface dimension.
    */
  def nodeCount: Int = children.length

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
