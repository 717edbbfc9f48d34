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

  test("IVF topk: k ranked candidates per query, deterministic, no self") {
    val r1 = Ann.ivfTopK(Ann.embeddings(spark, sfTiny)).collect()
    val byQuery = r1.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
      rows.foreach(r => assert(r.getLong(2) != q))
    }
    val r2 = Ann.ivfTopK(Ann.embeddings(spark, sfTiny)).collect()
    assert(r1.map(_.toSeq).toSet == r2.map(_.toSeq).toSet)
  }

  private def recallAt5(approx: Array[org.apache.spark.sql.Row],
      exact: Array[org.apache.spark.sql.Row]): Double = {
    val a = approx.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    val e = exact.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    e.map { case (q, ns) => (a.getOrElse(q, Set.empty) & ns).size.toDouble / ns.size }
      .sum / e.size
  }

  test("IVF recall: >= candidate fraction on uniform vectors, ~total on a clustered corpus") {
    import spark.implicits._
    // Uniform-random corpus = the worst case for any partitioning ANN: the
    // probed-cell mass bounds recall, so expect ≈ nProbe/K (6/16 = 0.375)
    // plus the query-local excess. Floor set from the measured 0.66 with
    // margin; the point is it must not sink BELOW the fraction.
    val emb = Ann.embeddings(spark, sfTiny)
    val uniformRecall = recallAt5(Ann.ivfTopK(emb).collect(), Ann.bruteTopK(emb).collect())
    assert(uniformRecall >= 0.5, f"uniform-corpus recall $uniformRecall%.2f < 0.5")
    // Clustered corpus — the regime IVF exists for: 8 well-separated
    // centers, 5% deterministic per-member noise. Hash-sampled centroids
    // land inside clusters, queries probe their own cluster first, and
    // recall should be ~total at the same 6/16 candidate fraction.
    val dim = Ann.Dim
    val clustered = (0 until 500).map { id =>
      val c = id % 8
      (id.toLong, Seq.tabulate(dim)(i =>
        math.sin(c * dim + i) + 0.05 * math.sin(id * 997 + i * 131)))
    }.toDF("vec_id", "v")
    val clusteredRecall =
      recallAt5(Ann.ivfTopK(clustered).collect(), Ann.bruteTopK(clustered).collect())
    assert(clusteredRecall >= 0.9, f"clustered-corpus recall $clusteredRecall%.2f < 0.9")
    assert(clusteredRecall > uniformRecall)
  }

  test("bucket strings are deterministic across runs") {
    val b1 = Ann.srpBuckets(Ann.embeddings(spark, sfTiny)).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b2 = Ann.srpBuckets(Ann.embeddings(spark, sfTiny)).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b1 == b2)
    b1.values.foreach(s => assert(s.length == 8))
  }

  test("malformed-row verdicts: short vectors fold the shared prefix, zero vectors normalize to zeros") {
    import graft.similarity.AnnOps
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val short = new GenericArrayData(Array[Any](1.0, 2.0)) // shorter than the baked width
    val cents = Array(Array(1.0, 1.0, 1.0), Array(0.0, 1.0, 0.0))
    // never an out-of-bounds ArrayData read: the fold stops at the prefix
    val cos = AnnOps.centroidCos(short, cents)
    assert(cos.toDoubleArray().toSeq == Seq(3.0, 2.0))
    assert(AnnOps.centroidArgmax(short, cents) == 0)
    val planes = Array(Array(Array(1.0, 1.0, 1.0), Array(-1.0, 0.0, 0.0)))
    val keys = AnnOps.srpKeys(short, planes)
    assert(keys.getUTF8String(0).toString == "10") // 3.0 > 0, -1.0 <= 0
    // zero vector: all-zero unit vector (cosine 0 everywhere), never NaN
    val zero = new GenericArrayData(Array[Any](0.0, 0.0, 0.0))
    val u = AnnOps.unitVec(zero).toDoubleArray()
    assert(u.toSeq == Seq(0.0, 0.0, 0.0))
    assert(!u.exists(_.isNaN))
  }
}
