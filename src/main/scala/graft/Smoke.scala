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
    val df = SparkEntry.queries("q_mention_context")(spark, sf)
    println(s"SMOKE q_mention_context rows=${df.count()}")
    df.filter(col("url").endsWith("/doc/3")).orderBy("pos").show(6, false)
    spark.stop()
  }
}
