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
    for (q <- Seq("q_entity_aliases", "q_linked_partition", "q_lineage")) {
      val t = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sf)
      println(f"SMOKE $q rows=${df.count()} in ${(System.nanoTime()-t)/1e9}%.1fs")
      df.show(4, false)
    }
    spark.stop()
  }
}
