package graft

import graft.similarity.Ann
import graft.dedup.Dedup

class AnnSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("brute-force topk returns k ranked neighbors per query") {
    val topk = Ann.bruteTopK(Ann.embeddings(spark, sfTiny)).collect()
    val byQuery = topk.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
      // no self matches
      rows.foreach(r => assert(r.getLong(2) != r.getLong(0)))
    }
  }

  test("SRP-LSH pairs equal brute-force pairs on the planted corpus") {
    // planted +0.01 variants are angularly ~identical → survive banding
    val emb = Dedup.embCorpus(spark, sfTiny)
    val pairs = Ann.lshPairs(emb).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0).select("vec_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 1000000L)).toSet
    assert(planted.subsetOf(pairs),
      s"LSH missed ${(planted -- pairs).size}/${planted.size} planted pairs")
    // verification keeps precision exact AND banding keeps recall total here:
    // the wired q_dedup_embed (LSH) is hash-compared to a brute DuckDB oracle
    val brute = Dedup.embeddingNearDupBrute(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == brute, s"LSH≠brute: missed=${(brute -- pairs).size} extra=${(pairs -- brute).size}")
  }

  test("bucket strings are deterministic across runs") {
    val b1 = Ann.srpBuckets(Ann.embeddings(spark, sfTiny)).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b2 = Ann.srpBuckets(Ann.embeddings(spark, sfTiny)).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b1 == b2)
    b1.values.foreach(s => assert(s.length == 8))
  }
}
