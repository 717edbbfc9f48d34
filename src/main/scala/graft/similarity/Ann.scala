package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.cosineExpr

/** Similarity search over an embedding column.
  *
  * Brute-force cosine top-k is the correctness baseline (broadcast the query
  * set — small — against the full corpus: one narrow pass + a per-query
  * top-k). The scale path is sign-random-projection LSH bucketing: only
  * vectors sharing a bucket are compared, so the join is equi on bucket key
  * instead of all-pairs.
  */
object Ann {

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))

  /** Exact top-k neighbors by cosine for each query vector (vec_id < nQueries).
    * The query side is broadcast — the big side streams once, no shuffle of
    * the corpus; per-query ranking shuffles only (nQueries × corpus) score
    * rows bounded by the queries' selectivity.
    */
  def bruteTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("v").as("vn"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineExpr("vq", "vn"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Sign-random-projection bucket key: for `nPlanes` deterministic
    * hyperplanes, bit = sign(Σ v[i]·p[i]) with p[i] = ±1 derived from
    * md5(plane:i) parity — fully reproducible in SQL, no RNG. Vectors in the
    * same bucket are near in angle with high probability.
    */
  def srpBuckets(emb: DataFrame, nPlanes: Int = 8): DataFrame = {
    val bitExprs = (0 until nPlanes).map { p =>
      // p_i = +1 if last hex digit of md5("p:i") is even else -1
      val dot = expr(
        s"""aggregate(zip_with(v, sequence(0, size(v) - 1),
           |  (x, i) -> x * (1d - 2d * (cast(conv(substring(md5(concat('$p', ':', i)), 32, 1), 16, 10) as int) & 1))),
           |  0d, (s, x) -> s + x)""".stripMargin)
      when(dot > 0, lit("1")).otherwise(lit("0"))
    }
    emb.withColumn("bucket", concat(bitExprs: _*))
  }

  /** LSH-bucketed near-neighbor pairs: equi-join on bucket, verify cosine ≥
    * minCos. At 100 TB this replaces the all-pairs product with per-bucket
    * products (buckets are balanced by construction: random hyperplanes).
    */
  def lshPairs(emb: DataFrame, minCos: Double = 0.99, nPlanes: Int = 8): DataFrame = {
    val b = srpBuckets(emb, nPlanes)
    val l = b.select(col("vec_id").as("a"), col("v").as("va"), col("bucket"))
    val r = b.select(col("vec_id").as("b"), col("v").as("vb"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .filter(cosineExpr("va", "vb") >= minCos)
      .select(col("a"), col("b"))
      .distinct()
  }
}
