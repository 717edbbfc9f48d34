package graft

import org.apache.spark.sql.SparkSession
import graft.extract.Extract
import graft.mentions.Mentions
import graft.model.Gazetteer
import graft.pipeline.Pipeline
import graft.relations.Relations
import graft.sources.Pages

/** Stage-isolated timing of the flagship's co-occurrence pairing: builds the
  * amplified mention cache ONCE (untimed), then times ONLY
  * `Relations.cooccurrence` via the order-insensitive triple checksum
  * (warm-up + min-of-reps, the repo's noise protocol). Exists to attribute
  * flagship time between the scan and the pairing stage before/after the
  * pairing's expression rewrite.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_AMPLIFY (40), SPARK_GRAFT_TARGET_REPS (3).
  */
object CoocBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "40").toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TARGET_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cooc-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = Pages.synthesizeAmplified(spark, sfDir, factor)
    val ms = Mentions.scanWithRecall(Extract.segments(pages), Gazetteer.all.toArray).cache()
    val nMentions = ms.count() // untimed: materializes the cache

    def timeIt(body: => (Long, Long)): (Seq[Double], Long) = {
      val (_, ts, last) = graft.util.BenchProto.minOf(reps)(body)
      (ts, last._1)
    }

    val (coocTs, nCooc) = timeIt(Pipeline.tripleChecksum(Relations.cooccurrence(ms).toDF()))
    val coocJson =
      s""""cooc_sec":${f"${coocTs.min}%.3f"},"cooc_reps":${coocTs.map(t => f"$t%.3f").mkString("[", ",", "]")},"n_cooc":$nCooc"""
    ms.unpersist()
    println(s"""{"metric":"cooc_stage","n_mentions":$nMentions,$coocJson,"amplify":$factor,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
