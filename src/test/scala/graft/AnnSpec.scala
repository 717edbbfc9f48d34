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

  test("SRP-LSH pairs find the planted near-identical vectors") {
    // planted +0.01 variants are angularly ~identical → same bucket always
    val emb = Dedup.embCorpus(spark, sfTiny)
    val pairs = Ann.lshPairs(emb).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0).select("vec_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 1000000L)).toSet
    assert(planted.subsetOf(pairs) || (planted -- pairs).size <= planted.size / 10,
      s"LSH missed ${(planted -- pairs).size}/${planted.size} planted pairs")
    // verification keeps precision exact: every emitted pair really has cos >= 0.99
    val brute = Dedup.embeddingNearDup(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(brute))
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
