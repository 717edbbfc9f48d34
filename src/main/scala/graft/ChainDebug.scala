package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary scratch main: diagnose per-round cost + plan depth of the
// large-star/small-star CC loop on a chain graph (not part of the contract).
object ChainDebug {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val verts = (0 until n).map(i => f"v$i%05d").toDF("surface")
    val edges = (1 until n).map(i => (f"v${i - 1}%05d", f"v$i%05d")).toDF("a", "b")
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.canon.Canon.connectedComponentsWithRounds(
      verts, edges, maxIter = 25, localThreshold = 0)
    val bad = labels.filter(col("component") =!= "v00000").count()
    println(f"CHAIN n=$n rounds=$rounds bad=$bad total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
