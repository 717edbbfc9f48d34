package graft

import org.apache.spark.sql.SparkSession

// Temporary scratch main for local smoke checks (not part of the contract).
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val out = "/tmp/smoke_out"
    val names = Seq("q_ensemble", "q_gliner_windows", "q_canon", "q_cc_dist",
      "q_eval_pairs", "q_lineage")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sf)
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      println(f"SMOKE $n rows=${spark.read.parquet(s"$out/$n").count()} in ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    // dump the two new oracle SQLs for the python comparer
    val sqls = Seq("q_ensemble" -> graft.verify.Oracle.qEnsemble,
      "q_gliner_windows" -> graft.verify.Oracle.qGlinerWindows,
      "q_canon" -> graft.verify.Oracle.qCanon,
      "q_cc_dist" -> graft.verify.Oracle.qCcDist,
      "q_eval_pairs" -> graft.verify.Oracle.qEvalPairs,
      "q_lineage" -> graft.verify.Oracle.qLineage)
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
