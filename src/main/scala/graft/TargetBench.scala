package graft

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing harness: `runMain graft.TargetBench q_a q_b …`
  * times just the named SparkEntry queries (untimed warm-up + min of
  * SPARK_GRAFT_TARGET_REPS, default 3, in one JVM — the repo's noise
  * protocol) and prints one JSON line. Used for focused evidence runs
  * (e.g. the md5-vs-xxhash64 MinHash family comparison in
  * BENCH/BASELINE.md) where a full Bench sweep would bury the signal.
  *
  * SPARK_GRAFT_MINHASH_FN, if set, is copied into the
  * `graft.minhash.fn` system property before any query runs (forked sbt
  * JVMs don't inherit -D flags from the sbt command line).
  */
object TargetBench {
  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_MINHASH_FN")
      .foreach(v => System.setProperty("graft.minhash.fn", v))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TARGET_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-target-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_cc_dist")
    val results = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val (_, ts, _) = graft.util.BenchProto.minOf(reps)(fn(spark, sfDir).count())
      name -> ts
    }
    val body = results.map { case (n, ts) =>
      s""""$n":{"min":${f"${ts.min}%.3f"},"reps":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}}"""
    }.mkString(",")
    println(s"""{"metric":"target_bench","minhash_fn":"${graft.model.Config.MinHashFn}","cpus":$cpus,"sf":"$sfDir","queries":{$body}}""")
    spark.stop()
  }
}
