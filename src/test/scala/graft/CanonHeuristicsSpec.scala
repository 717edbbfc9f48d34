package graft

import graft.canon.Canon
import graft.model.Gazetteer

class CanonHeuristicsSpec extends SparkSpec {

  private def dim(surfaces: Seq[String]) = Canon.surfaceDim(spark, surfaces)

  test("subsetEdges finds word-bag subset pairs (C4)") {
    val edges = Canon.subsetEdges(dim(Gazetteer.persons))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges.contains(("Jonathan Smith", "Jonathan Petrov Smith")))
    assert(edges.contains(("Carlos Mendez", "Carlos Mendez Rivera")))
    assert(edges.contains(("Mei Zhang", "Mei Lin Zhang")))
    // never equal-size or reversed pairs
    edges.foreach { case (a, b) => assert(a.split(" ").length < b.split(" ").length) }
  }

  test("abbrevEdges expands initials to full names (C5)") {
    val edges = Canon.abbrevEdges(dim(Gazetteer.persons ++ Gazetteer.abbrevPersons))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges.contains(("H. Johansson", "Henrik Johansson")))
    assert(edges.contains(("M. E. Vasquez", "Maria Elena Vasquez")))
    // accent-folded variant matches too
    assert(edges.contains(("M. E. Vasquez", "María Elena Vásquez")))
    // no edge into a name that lacks matching initials
    assert(!edges.exists { case (a, b) => a == "H. Johansson" && b != "Henrik Johansson" })
  }

  test("pairEval computes exact pair counts on a toy clustering") {
    import spark.implicits._
    // prediction: {a,b,c} together, {d} alone; golden: {a,b} and {c,d}
    val canon = Seq(("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"))
      .toDF("surface", "canonical")
    val golden = Seq((0, "a"), (0, "b"), (1, "c"), (1, "d")).toDF("group_id", "surface")
    val row = Canon.pairEval(canon, golden).collect().head
    assert(row.getLong(0) == 3) // ab ac bc
    assert(row.getLong(1) == 2) // ab cd
    assert(row.getLong(2) == 1) // ab
  }
}
