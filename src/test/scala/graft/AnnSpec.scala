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

  test("q_ann_lsh gate validity: every qualifying pair sits far above the banding miss zone") {
    // 4-band/8-plane SRP recall is probabilistic near the 0.99 threshold
    // (~0.9% worst-case miss per pair at cos=0.99). The q_ann_lsh ≡ brute
    // driver gate is therefore CORPUS-specific, valid because every
    // qualifying pair here is a planted near-identical variant: assert the
    // margin so a corpus change that introduces a borderline pair fails
    // this spec instead of flaking the driver gate.
    val e = Ann.withUnit(Dedup.embCorpus(spark, sfTiny))
    val pairs = e.select(col("vec_id").as("a"), col("nv").as("na"))
      .join(e.select(col("vec_id").as("b"), col("nv").as("nb")), col("a") < col("b"))
      .select(col("a"), col("b"), Ann.unitDot("na", "nb").as("cos"))
      .filter(col("cos") >= 0.99)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(2) >= 0.999,
        s"borderline pair (${r.getLong(0)}, ${r.getLong(1)}) at cos=${r.getDouble(2)} — " +
          "q_ann_lsh's brute-oracle equivalence is no longer structurally safe")
    }
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
