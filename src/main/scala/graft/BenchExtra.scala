package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first) — NOT a
  * driver surface: Bench.scala stays the frozen contract; this main exists so
  * per-query work can be isolated and attributed without touching it.
  *
  * `runMain graft.BenchExtra q_a q_b …` times each named SparkEntry query
  * (untimed warm-up + min of SPARK_GRAFT_TARGET_REPS, default 3) and, for
  * the LAST rep, records every Spark job that ran: job id, duration, number
  * of stages, task count and description — so a 9-second query made of 40
  * tiny jobs is distinguishable from one 9-second shuffle. The special name
  * `flagship` times Pipeline.flagshipCount at SPARK_GRAFT_AMPLIFY (default
  * 40), matching the frozen Bench methodology.
  */
object BenchExtra {

  private final case class JobRec(id: Int, desc: String, var endMs: Long,
      startMs: Long, var nStages: Int, var nTasks: Int, stageNames: Seq[String])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TARGET_REPS", "3").toInt)
    val amplify = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "40").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    @volatile var tracing = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (tracing) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, 0L, js.time, js.stageInfos.size, 0,
          js.stageInfos.map(si => s"${si.name} [${si.numTasks}t]")))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (tracing) {
        Option(jobs.get(je.jobId)).foreach(_.endMs = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (tracing) {
        // attribute tasks to the owning job via jobIds in properties — skip;
        // approximate: add to the most recent unfinished job
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq else Seq("q_cc_dist")
    val out = new StringBuilder
    names.foreach { name =>
      def runOnce(): Unit =
        if (name == "flagship") { Pipeline0.flagshipCount(spark, sfDir, amplify); () }
        else { SparkEntry.queries(name)(spark, sfDir).count(); () }
      runOnce() // warm-up (pays memo fills / codegen / JIT)
      val ts = (1 to reps).map { i =>
        val trace = i == reps
        if (trace) { jobs.clear(); tracing = true }
        val t0 = System.nanoTime()
        runOnce()
        val dt = (System.nanoTime() - t0) / 1e9
        if (trace) tracing = false
        dt
      }
      import scala.jdk.CollectionConverters._
      val recs = jobs.values().asScala.toSeq.sortBy(_.id)
      val jobLines = recs.map { r =>
        val dur = if (r.endMs > 0) r.endMs - r.startMs else -1L
        f"    job ${r.id}%4d ${dur}%6d ms  stages=${r.nStages}%2d  " +
          r.stageNames.mkString(" | ").take(200)
      }
      val totalJobMs = recs.map(r => math.max(0L, r.endMs - r.startMs)).sum
      out.append(f"$name: min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString("[", ",", "]")} " +
        f"njobs=${recs.size} jobms=$totalJobMs\n")
      out.append(jobLines.mkString("\n")).append("\n")
      System.err.println(s"[bench-extra] done $name min=${f"${ts.min}%.3f"}")
    }
    println("===BENCH_EXTRA===")
    println(out.toString)
    spark.stop()
  }

  // indirection so the special "flagship" name stays obvious above
  private object Pipeline0 {
    def flagshipCount(spark: SparkSession, sfDir: String, factor: Int): Long =
      graft.pipeline.Pipeline.flagshipCount(spark, sfDir, factor)
  }
}
