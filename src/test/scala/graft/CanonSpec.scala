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
    val comps = Canon.connectedComponents(vertices, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps("a") == "a" && comps("b") == "a" && comps("c") == "a")
    assert(comps("d") == "d" && comps("e") == "d")
    assert(comps("z") == "z")
  }
}
