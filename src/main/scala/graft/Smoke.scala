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
    val sfBig = "/root/testdata/sf0.1"

    val t0 = System.nanoTime
    val lsh = graft.dedup.Dedup.embeddingNearDup(spark, sfBig).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t1 = System.nanoTime
    val brute = graft.dedup.Dedup.embeddingNearDupBrute(spark, sfBig).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t2 = System.nanoTime
    println(s"SMOKE lsh=${lsh.size} in ${(t1-t0)/1e9}s brute=${brute.size} in ${(t2-t1)/1e9}s equal=${lsh == brute}")

    val dq = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"),
        graft.functions.Dates.parseCol(graft.functions.Dates.renderCol(
          year(col("ts")), month(col("ts")), dayofmonth(col("ts")),
          pmod(col("event_id"), lit(4)).cast("int"))).cast("string").as("parsed_date"),
        date_format(col("ts"), "yyyy-MM-dd").as("expect"))
    val bad = dq.filter(col("parsed_date") =!= col("expect") || col("parsed_date").isNull).count()
    println(s"SMOKE q_dates mismatches=$bad of ${dq.count()}")

    val dm = graft.functions.Dates.dateMentions(graft.functions.Dates.dateCorpus(spark, sf))
    println(s"SMOKE date mentions rows=${dm.count()} (expect 1000)")
    dm.filter(col("doc_id").isin(0, 1, 5, 9)).orderBy("doc_id", "pos").collect().foreach(r => println(s"SMOKE $r"))
    spark.stop()
  }
}
