package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-read helpers shared by the operator modules. */
object Reads {

  /** Spread a COARSELY-SPLIT source over the session's cores (optimization
    * guide §2.5: "repartition immediately after the read"): operators whose
    * expensive per-row work runs in the scan stage are otherwise limited to
    * the source's split count, which for a small table is one task per file
    * (or per union leg). Adaptive, not a constant: the exchange is added
    * only when the source yields fewer splits than the session's default
    * parallelism, so a production table with thousands of splits is never
    * shuffled by this.
    */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  def spread(df: DataFrame): DataFrame = spread(df.sparkSession, df)
}
