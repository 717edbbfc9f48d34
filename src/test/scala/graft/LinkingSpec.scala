package graft

import org.apache.spark.sql.functions._
import graft.linking.Linking
import graft.pipeline.Pipeline

class LinkingSpec extends SparkSpec {

  test("alias dict maps golden alias groups to one entity id") {
    val dict = Linking.aliasRows
    val byGroup = dict.filter(_._2 == "PERSON").groupBy(_._3)
    // group 0 has two alias surfaces sharing the entity id
    assert(byGroup(0L).map(_._1).toSet ==
      Set("Maria Elena Vasquez", "María Elena Vásquez"))
    // priors are deterministic and integral
    assert(dict.forall { case (_, _, id, p) => p == Linking.priorOf(id) && p >= 0 && p < 1000 })
  }

  test("link scores every mention surface against its dictionary entity") {
    val linked = Linking.link(
      Pipeline.mentionsCached(spark, sfTiny).toDF(), spark, sfTiny).cache()
    val n = linked.count()
    assert(n > 0)
    // every (surface,label) of the gazetteer that was mentioned resolves
    val unresolved = Pipeline.mentionsCached(spark, sfTiny).toDF()
      .select(col("url"), col("surface"), col("label")).distinct()
      .join(linked, Seq("url", "surface", "label"), "left_anti").count()
    assert(unresolved == 0)
    // score = prior/2 + 500·cos ∈ [-500, 1000] milli-units
    val bad = linked.filter(col("score_milli") < -500 || col("score_milli") > 1000).count()
    assert(bad == 0)
    // alias pair resolves to the same entity id
    val ids = linked.filter(col("surface").isin("Maria Elena Vasquez", "María Elena Vásquez"))
      .select(col("entity_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(Set(0L)) )
  }
}
