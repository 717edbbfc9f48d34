package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary scratch main for local smoke checks (not part of the contract).
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // warm the mention/canon caches the way the bench sweep does
    SparkEntry.queries("q_canon")(spark, sf).count()
    val t = System.nanoTime()
    val df = SparkEntry.queries("q_lineage")(spark, sf)
    println(f"SMOKE q_lineage rows=${df.count()} in ${(System.nanoTime()-t)/1e9}%.1fs (sf0.1, warm caches)")
    spark.stop()
  }
}
