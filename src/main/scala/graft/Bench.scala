package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark. Primary metric (BASELINE.json): triples/sec for the
  * end-to-end pages → triples flagship pipeline; per-query wall times for
  * every SparkEntry query follow in the `queries` map.
  *
  * Parallelism comes from SPARK_GRAFT_CPUS (the scaling-efficiency harness in
  * tools/bench_scaling.sh runs this main at 8 and 32 cores on the same input
  * — the sandbox evidencing of the N→4N executor criterion, BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Flagship: full KG pipeline end to end (scan → extract → mentions →
    // canon CC → triples) over the amplified corpus (SPARK_GRAFT_AMPLIFY
    // deterministic copies; default 20) so the timed work is
    // data-proportional rather than fixed-cost-dominated at sandbox SFs.
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "20").toInt
    val t0 = System.nanoTime()
    val nTriples = graft.pipeline.Pipeline
      .triplesAmplified(spark, sfDir, amplify).toDF().count()
    val flagshipSec = (System.nanoTime() - t0) / 1e9
    val triplesPerSec = nTriples / flagshipSec

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"triples_per_sec","value":$triplesPerSec,"unit":"triples/sec","flagship_sec":$flagshipSec,"n_triples":$nTriples,"amplify":$amplify,"cpus":$cpus,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
