package graft

import org.apache.spark.sql.functions._
import graft.aggregate.Entities
import graft.canon.Canon
import graft.pipeline.Pipeline

class EntitiesSpec extends SparkSpec {

  test("rollup emits array<struct> occurrences consistent with counts (A1)") {
    val ms = Pipeline.mentionsCached(spark, sfTiny)
    val rolled = Entities.rollup(ms).cache()
    val bad = rolled.filter(size(col("occurrences")) =!= col("n_mentions")).count()
    assert(bad == 0)
    assert(rolled.count() ==
      ms.toDF().select(col("surface"), col("label")).distinct().count())
    // occurrences are sorted (deterministic output)
    val one = rolled.orderBy(col("n_mentions").desc).select(col("occurrences")).head()
      .getSeq[org.apache.spark.sql.Row](0)
    val urls = one.map(_.getString(0))
    assert(urls == urls.sorted)
  }

  test("canonicalRollup merges alias provenance (A3/C8)") {
    val ms = Pipeline.mentionsCached(spark, sfTiny)
    val canon = Pipeline.canonCached(spark, sfTiny)
    val rolled = Entities.canonicalRollup(ms, canon).cache()
    // the accent pair rolls up into one row carrying both aliases
    val row = rolled.filter(col("canonical") === "María Elena Vásquez" ||
        col("aliases").getItem(0) === "Maria Elena Vasquez")
      .filter(col("label") === "PERSON").collect()
    assert(row.nonEmpty)
    assert(row.exists(_.getSeq[String](4).size >= 2))
    // total mention mass is preserved by the alias merge
    val total = Entities.rollup(ms).agg(sum("n_mentions")).head.getLong(0)
    assert(rolled.agg(sum("n_mentions")).head.getLong(0) == total)
  }

  test("linkedPartition splits linked vs isolated surfaces (C7)") {
    import spark.implicits._
    val vertices = Seq("a", "b", "c").toDF("surface")
    val edges = Seq(("a", "b")).toDF("a", "b")
    val got = Canon.linkedPartition(vertices, edges)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("a" -> true, "b" -> true, "c" -> false))
  }
}
