package graft

import org.apache.spark.sql.DataFrame
import graft.model.Gazetteer
import graft.sources.Pages
import graft.extract.Extract
import graft.mentions.Mentions
import graft.fuzzy.Fuzzy

/** Physical-plan shape guards: shuffle frontiers of the load-bearing
  * pipelines are pinned, so a change that silently introduces an Exchange
  * (the thing that becomes the bottleneck at 100×) fails a spec instead of
  * only showing up in a bench regression. Counts come from the SimpleMode
  * explain of the UNCACHED compositions (cache state would otherwise make
  * the plans depend on suite order).
  */
class PlanSpec extends SparkSpec {

  private def exchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    // Count DISTINCT hash-shuffle exchanges:
    //  - "BroadcastExchange" (not a shuffle) and "ReusedExchange" are
    //    excluded;
    //  - an executed AQE plan prints the FINAL and the INITIAL plan, so the
    //    same exchange can appear twice — dedupe by plan_id;
    //  - RoundRobinPartitioning exchanges are the DELIBERATE coarse-source
    //    rebalance (graft.util.Reads.spread, optimization guide §2.5) and
    //    are excluded: this spec guards against ACCIDENTAL mid-pipeline
    //    hash shuffles, which a round-robin spread is not.
    plan.linesIterator
      .filter(_.contains("Exchange "))
      .filterNot(_.contains("ReusedExchange"))
      .filterNot(_.contains("BroadcastExchange"))
      .filterNot(_.contains("RoundRobinPartitioning"))
      .map(l => "plan_id=(\\d+)".r.findFirstMatchIn(l).map(_.group(1)).getOrElse(l))
      .toSet.size
  }

  test("extraction and scan stages are narrow: zero shuffles end to end") {
    import org.apache.spark.sql.functions._
    val pages = Pages.synthesize(spark, sfTiny)
    assert(exchanges(pages.toDF()) == 0, "page synthesis must stay narrow")
    val segs = Extract.segments(pages)
    assert(exchanges(segs.toDF()) == 0, "HTML->segment extraction must stay narrow")
    val mentions = Mentions.scanWithRecall(segs, Gazetteer.all.toArray)
    assert(exchanges(mentions.toDF()) == 0, "mention scan must stay narrow")
    assert(exchanges(Fuzzy.scanWindowed(segs,
      Gazetteer.persons.map(_ -> "PERSON").toArray).toDF()) == 0,
      "M4 windowed scan must stay narrow")
    assert(exchanges(graft.functions.Dates.dateMentions(
      graft.functions.Dates.dateCorpus(spark, sfTiny))) == 0,
      "in-text date scan must stay narrow")
  }

  test("aggregation frontiers shuffle exactly once") {
    import org.apache.spark.sql.functions._
    val ms = Mentions.scanWithRecall(
      Extract.segments(Pages.synthesize(spark, sfTiny)), Gazetteer.all.toArray)
    val counts = ms.toDF().groupBy(col("url"), col("surface"), col("label"))
      .agg(count(lit(1)).as("n"))
    assert(exchanges(counts) == 1, "mention rollup = one partial-agg shuffle")
    val cooc = graft.relations.Relations.cooccurrence(ms)
    assert(exchanges(cooc.toDF()) <= 1,
      "co-occurrence pairs shuffle at most once (segment keys)")
  }

  test("the ANN brute baseline is the only broadcast nested loop") {
    val bnl = "BroadcastNestedLoopJoin"
    val topk = graft.similarity.Ann.bruteTopK(
      graft.similarity.Ann.embeddings(spark, sfTiny))
    val topkPlan = topk.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(topkPlan.contains(bnl), "brute top-k intentionally broadcasts the tiny query side")
    // the LSH scale path must NOT fall back to a nested loop
    val lsh = graft.similarity.Ann.lshPairs(
      graft.dedup.Dedup.embCorpus(spark, sfTiny), minCos = 0.99)
    assert(!lsh.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode).contains(bnl),
      "SRP-LSH path regressed to an all-pairs nested loop")
  }
}
