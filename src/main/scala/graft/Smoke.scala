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
    for (q <- Seq("q_dedup_ngram", "q_dedup_minhash", "q_dedup_simhash")) {
      val t = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      println(f"SMOKE $q rows=$n in ${(System.nanoTime()-t)/1e9}%.1fs")
    }
    // simhash payload must be unchanged by the explode-free rewrite: spot 3 rows
    graft.dedup.Dedup.simhash(graft.dedup.Dedup.corpus(spark, sf))
      .filter(col("doc_id").isin(0, 7, 35)).orderBy("doc_id")
      .collect().foreach(r => println(s"SMOKE sh ${r.getLong(0)} ${r.getString(1)}"))
    spark.stop()
  }
}
