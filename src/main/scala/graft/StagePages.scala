package graft

import org.apache.spark.sql.SparkSession

/** Stage the BASELINE input_hint page table `(url, warc_ts, html, text,
  * lang)` as parquet — the deterministic small-scale synthesis of the
  * production input shape, written to disk so [[Submit]] (and a real
  * spark-submit invocation of it) can be driven end to end against a
  * page TABLE rather than the sandbox documents parquet.
  *
  * {{{
  * spark-submit --class graft.StagePages <jar> <sfDir> <outDir> [nParts]
  * }}}
  *
  * Same no-master policy as [[Submit]]: cluster shape comes from the
  * launcher (SPARK_GRAFT_MASTER is the sandbox escape hatch).
  */
object StagePages {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.StagePages <sfDir> <outDir> [nParts]")
    val b = SparkSession.builder().appName("graft-stage-pages")
    sys.env.get("SPARK_GRAFT_MASTER").foreach(b.master)
    val spark = b.getOrCreate()
    try {
      val pages = graft.sources.Pages.synthesize(spark, args(0))
      val parts = if (args.length > 2) args(2).toInt
        else spark.sparkContext.defaultParallelism
      pages.repartition(parts).write.mode("overwrite").parquet(args(1))
      println(s"[stage] wrote ${spark.read.parquet(args(1)).count()} pages to ${args(1)}")
    } finally spark.stop()
  }
}
