package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary scratch main for local smoke checks (not part of the contract).
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("q_linking_best", "q_entity_occ", "q_cc_dist", "q_lineage", "q_normalize")) {
      val t = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sf)
      println(s"SMOKE $q rows=${df.count()} in ${(System.nanoTime()-t)/1e9}%.1f".replace("%.1f",""))
      df.show(3, false)
    }
    spark.stop()
  }
}
