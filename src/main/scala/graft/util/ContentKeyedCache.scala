package graft.util

/** Executor-local cache keyed by ARRAY CONTENT, shared by the broadcast
  * automaton ([[graft.mentions.AhoCorasick.cached]]) and the gazetteer token
  * index ([[graft.mentions.Mentions.cachedTokenIndex]]) so the
  * collision-confirmation discipline lives in exactly one place.
  *
  * The 32-bit `Arrays.hashCode` key alone is NOT identity — a collision
  * between two distinct key arrays would silently serve the wrong value — so
  * hits are confirmed with a full content compare; a colliding entry is
  * replaced (latest wins: correctness always, amortization except in the
  * ~2⁻³² pathological alternation). The stored key is a defensive clone, and
  * the map is bounded so a long-lived service cycling keys can't grow it
  * without limit (eviction is a full clear — entries are cheap to rebuild
  * and `maxEntries` is far above any steady-state working set).
  */
final class ContentKeyedCache[V](maxEntries: Int = 64) extends Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[AnyRef], V)]()

  def get[A <: AnyRef](key: Array[A])(build: Array[A] => V): V = {
    val h = java.util.Arrays.hashCode(key.asInstanceOf[Array[AnyRef]])
    if (cache.size > maxEntries) cache.clear()
    cache.compute(h, (_, cur) =>
      if (cur != null && java.util.Arrays.equals(
          cur._1, key.asInstanceOf[Array[AnyRef]])) cur
      else (key.clone().asInstanceOf[Array[AnyRef]], build(key))
    )._2
  }

  private[graft] def size: Int = cache.size
}
