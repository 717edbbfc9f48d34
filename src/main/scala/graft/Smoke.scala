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
    val t = System.nanoTime()
    val qf = SparkEntry.queries("q_fuzzy_char")(spark, sf)
    val engine = qf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    println(f"SMOKE q_fuzzy_char rows=${engine.size} in ${(System.nanoTime()-t)/1e9}%.1fs")

    // cross-check against the oracle VALUES by simulating the SQL join in Scala
    val sql = graft.verify.Oracle.qFuzzyChar
    val vals = """\((\d+), (\d+), '([^']*)', (-?\d+), (-?\d+), (\d+)\)""".r
    val m = vals.findAllMatchIn(sql).map(x =>
      ((x.group(1).toInt, x.group(2).toInt), (x.group(3), x.group(4).toLong, x.group(5).toLong, x.group(6).toLong))).toList
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nP = graft.model.Gazetteer.persons.length
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id").collect().map(_.getLong(0))
    val expected = docs.flatMap { id =>
      m.getOrElse((((id * 7) % nP).toInt, (id % 3).toInt), Nil).map { case (s2, a, b, sc) => (id, s2, a, b, sc) }
    }.toSet
    println(s"SMOKE expected=${expected.size} engineOnly=${(engine -- expected).size} expectedOnly=${(expected -- engine).size}")
    (engine -- expected).take(5).foreach(x => println(s"SMOKE engineOnly $x"))
    (expected -- engine).take(5).foreach(x => println(s"SMOKE expectedOnly $x"))
    spark.stop()
  }
}
