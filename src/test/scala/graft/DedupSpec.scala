package graft

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  lazy val corpus = Dedup.corpus(spark, sfTiny).cache()

  test("exact dedup groups planted identical copies") {
    val groups = Dedup.exact(corpus).filter(col("n_docs") > 1).collect()
    // every 7th doc has an identical copy at doc_id+2000000
    val expected = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(col("doc_id") % 7 === 0).count()
    assert(groups.length >= (expected * 0.9).toInt) // rare cross-doc text collisions may merge groups
    groups.foreach { r => assert(r.getLong(1) >= 2) }
    // keeper is the min doc_id, i.e. always a base doc (< 1000000)
    groups.foreach { r => assert(r.getLong(2) < 1000000L) }
  }

  test("ngram jaccard finds exact copies and suffix-truncation near-dups") {
    val pairs = Dedup.ngramJaccard(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copies always at Jaccard 1.0
    val exactIds = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(col("doc_id") % 7 === 0).select("doc_id").collect().map(_.getLong(0))
    exactIds.foreach { id => assert(pairs.contains((id, id + 2000000L)), s"missing exact pair $id") }
    // most truncations survive the 0.8 threshold
    val nearIds = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(col("doc_id") % 5 === 0).select("doc_id").collect().map(_.getLong(0))
    val found = nearIds.count(id => pairs.contains((id, id + 1000000L)))
    assert(found >= (nearIds.length * 0.7).toInt, s"only $found/${nearIds.length} truncation pairs found")
  }

  test("minhash LSH candidates verify to a subset of exact jaccard pairs with high recall") {
    val exact = Dedup.ngramJaccard(corpus).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(corpus).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verification must never emit a pair below the threshold")
    assert(lsh.size >= (exact.size * 0.9).toInt, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash is identical for identical docs and 64 bits long") {
    val sh = Dedup.simhash(corpus).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sh.values.foreach(s => assert(s.length == 64 && s.forall(c => c == '0' || c == '1')))
    sh.keys.filter(id => id % 7 == 0 && id < 1000000L).take(20).foreach { id =>
      assert(sh(id) == sh(id + 2000000L), s"simhash differs for identical docs $id")
    }
  }

  test("embedding near-dup finds exactly the planted +0.01 variants") {
    val pairs = Dedup.embeddingNearDup(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0).select("vec_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 1000000L)).toSet
    assert(pairs == planted)
  }
}
