package graft

import graft.canon.Canon
import graft.model.Gazetteer
import graft.pipeline.Pipeline

class CanonSpec extends SparkSpec {

  lazy val canonMap: Map[String, String] =
    Canon.canonicalMap(Pipeline.mentions(spark, sfTiny))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("alias groups merge to one canonical per golden group (P/R vs golden = 1.0)") {
    // every golden group whose surfaces appear in the corpus maps to a single canonical
    Gazetteer.personGroups.foreach { group =>
      val present = group.filter(canonMap.contains)
      if (present.size > 1) {
        val canons = present.map(canonMap).toSet
        assert(canons.size == 1, s"group $group split into $canons")
      }
    }
  }

  test("negative pairs stay separate") {
    // different golden groups never share a canonical
    val byCanon = canonMap.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    val groupOf = Gazetteer.goldenAliasGroups.map { case (g, s) => s -> g }.toMap
    byCanon.foreach { case (canon, surfaces) =>
      val groups = surfaces.map(groupOf)
      assert(groups.size == 1, s"canonical $canon merges golden groups $groups: $surfaces")
    }
  }

  test("canonical pick is deterministic: most words, longest, then lexicographic") {
    // g2: "Carlos Mendez Rivera" (3 words) beats "Carlos Mendez"
    if (canonMap.contains("Carlos Mendez"))
      assert(canonMap("Carlos Mendez") == "Carlos Mendez Rivera")
    // g0 accent pair: equal words/mentions differ in surface bytes; expect
    // lexicographically last of equal-length pair
    if (canonMap.contains("Maria Elena Vasquez") && canonMap.contains("María Elena Vásquez")) {
      assert(canonMap("Maria Elena Vasquez") == canonMap("María Elena Vásquez"))
    }
  }

  test("connected components: permutation-invariant, handles chains") {
    import spark.implicits._
    val vertices = Seq("a", "b", "c", "d", "e", "z").toDF("surface")
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("a", "b")
    // exercise BOTH the driver-local union-find fast path and the
    // distributed min-label loop (localThreshold = 0 forces it); results
    // must be identical
    Seq(100000L, 0L).foreach { thr =>
      val comps = Canon.connectedComponents(vertices, edges, localThreshold = thr)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(comps("a") == "a" && comps("b") == "a" && comps("c") == "a")
      assert(comps("d") == "d" && comps("e") == "d")
      assert(comps("z") == "z")
    }
  }

  test("distributed CC agrees with local union-find on the live similarity graph") {
    val stats = Canon.surfaceStats(Pipeline.mentionsCached(spark, sfTiny))
    val edges = Canon.similarityEdges(stats).cache()
    val verts = stats.select("surface").cache()
    val local = Canon.connectedComponents(verts, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = Canon.connectedComponents(verts, edges, localThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local == dist)
  }
}
