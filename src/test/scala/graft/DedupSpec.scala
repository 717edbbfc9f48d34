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

  test("minhash hash families (md5 oracle path vs xxhash64 production path) are equivalent where it is structural") {
    // The md5 hex VARCHAR signatures exist for DuckDB parity; production
    // shuffles 8-byte xxhash64 longs. What IS family-invariant (and asserted):
    // precision (verification is exact in both) and recall of identical /
    // near-identical plants (equal shingle sets ⇒ equal signatures ⇒ same
    // band buckets in ANY hash family). What is NOT: band recall for pairs
    // NEAR the 0.8 threshold — banding is probabilistic per family (measured
    // here: md5 catches a handful of borderline truncation pairs xxhash64
    // does not). Hence a recall floor, not set equality.
    val exact = Dedup.ngramJaccard(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5Pairs = Dedup.minhashLsh(corpus, "md5").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val xxPairs = Dedup.minhashLsh(corpus, "xxhash64").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(md5Pairs.subsetOf(exact), "md5 family emitted a sub-threshold pair")
    assert(xxPairs.subsetOf(exact), "xxhash64 family emitted a sub-threshold pair")
    // exact-copy plants: Jaccard 1.0 ⇒ identical signatures ⇒ recalled by BOTH
    val copies = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(col("doc_id") % 7 === 0).select("doc_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 2000000L))
    copies.foreach { p =>
      assert(md5Pairs.contains(p), s"md5 missed exact-copy pair $p")
      assert(xxPairs.contains(p), s"xxhash64 missed exact-copy pair $p")
    }
    assert(md5Pairs.size >= (exact.size * 0.9).toInt, s"md5 recall ${md5Pairs.size}/${exact.size}")
    assert(xxPairs.size >= (exact.size * 0.9).toInt, s"xxhash64 recall ${xxPairs.size}/${exact.size}")
    // canon variant: the g0 accent pair has EQUAL sim_keys ⇒ equal shingle
    // sets ⇒ equal signatures ⇒ banding recall is structural in any family
    val dim = graft.canon.Canon.surfaceStats(
      graft.pipeline.Pipeline.mentionsCached(spark, sfTiny))
    Seq("md5", "xxhash64").foreach { fam =>
      val edges = graft.canon.Canon.minhashEdges(dim, fam).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(edges.contains(("Maria Elena Vasquez", "María Elena Vásquez")),
        s"$fam family missed the sim_key-equal accent pair")
    }
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

  test("banded simhash pairs equal brute all-pairs hamming (pigeonhole) and catch planted exact copies at 0") {
    val banded = Dedup.simhashPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute twin computed independently of the band structure
    val sims = Dedup.simhash(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      h = sa.zip(sb).count { case (x, y) => x != y }.toLong
      if h <= graft.model.Config.SimHashMaxHamming
    } yield (a, b, h)).toSet
    assert(banded == brute)
    // every planted exact copy (doc_id % 7 == 0 → +2000000) pairs at hamming 0
    val exactIds = corpus.filter(col("doc_id") < 1000000 && col("doc_id") % 7 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(exactIds.nonEmpty)
    exactIds.foreach(id => assert(banded.contains((id, id + 2000000L, 0L))))
  }

  test("native shingle expression matches the split/transform column form on adversarial strings") {
    // WordShingles replaced the HOF form for performance; this pins the
    // exact token semantics (each ' ' a separator: leading / adjacent /
    // trailing spaces delimit EMPTY tokens) against the form it replaced,
    // on strings the normalized corpus never produces.
    import spark.implicits._
    val rows = Seq(
      "a b c d e f",        // plain
      "a b c d e",          // exactly n tokens
      "a b c d",            // below n → no shingles
      "",                   // empty text
      " a b c d e",         // leading space (empty token 0)
      "a b  c d e f",       // adjacent spaces (empty token inside)
      "a b c d e ",         // trailing space (empty trailing token)
      "é ü ñ 漢 字 x y"      // multibyte chars around separators
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val native = Dedup.shingles(df).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val hof = df
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= Dedup.ShingleN)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${Dedup.ShingleN - 1}), i -> concat_ws(' ', slice(w, i, ${Dedup.ShingleN})))"
      )).as("s"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native == hof)
    assert(native.exists(_._2 == "a b  c d"), "adjacent-space shingle must keep the empty token's separators")
  }

  test("native shingle-hash expression equals xxhash64 over the string shingles") {
    // WordShingleHashes fingerprints each shingle in place (byte-range
    // xxhash64, seed 42) — must equal hashing the string form's output,
    // including on multibyte text and empty-token separators.
    import spark.implicits._
    val rows = Seq(
      "a b c d e f", "a b c d e", "a b c d", "",
      " a b c d e", "a b  c d e f", "a b c d e ",
      "é ü ñ 漢 字 x y"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val native = Dedup.shingleHashes(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaStrings = Dedup.shingles(df)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == viaStrings)
    assert(native.nonEmpty)
  }

  test("native simhash fingerprint matches the explode/distinct/sum aggregate form on adversarial strings") {
    // SimHash64 replaced the aggregate form for performance; this pins the
    // md5-bit arithmetic (bit b = bit 3−b%4 of hex digit b/4) and the
    // distinct-token set semantics (repeated tokens counted ONCE, empty
    // tokens from leading/adjacent/trailing spaces participate) against the
    // form it replaced.
    import spark.implicits._
    val rows = Seq(
      "a b c d e f",        // plain
      "a a a b",            // repeated token → counted once
      "",                   // empty text → single empty token
      " a b",               // leading space (empty token)
      "a  b",               // adjacent spaces (empty token inside)
      "a b ",               // trailing space (empty trailing token)
      "é ü ñ 漢 字",         // multibyte tokens
      "x"                   // single token: every bit from md5("x")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val native = Dedup.simhash(df).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val toks = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .distinct()
      .withColumn("h", md5(col("t")))
    val bitAggs = (0 until 64).map { b =>
      val bit = expr(
        s"shiftright(cast(conv(substring(h, ${b / 4 + 1}, 1), 16, 10) as int), ${3 - b % 4}) & 1")
      sum(bit * 2 - 1).as(s"acc$b")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), concat((0 until 64).map(b =>
        when(col(s"acc$b") > 0, lit("1")).otherwise(lit("0"))): _*).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(native == agg)
    val ab = Dedup.simhash(Seq((9L, "a b")).toDF("doc_id", "text")).head.getString(1)
    assert(ab == native(1L),
      "'a a a b' must fingerprint identically to 'a b' (distinct-token semantics)")
  }

  test("simhash drops null-text docs entirely (the explode-form and oracle verdict)") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.simhash(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L), "null-text doc must not emit a (doc_id, NULL) row")
  }

  test("incremental exact dedup: folding any split equals the full job; empty index/delta are identities") {
    import spark.implicits._
    val corpus = Dedup.corpus(spark, sfTiny)
    val full = Dedup.exact(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def folded(split: org.apache.spark.sql.Column) = {
      Dedup.exactIncremental(
        Dedup.exact(corpus.filter(split === 0)), corpus.filter(split =!= 0))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    // three content-independent split seams
    assert(folded(pmod(hash(col("doc_id")), lit(2))) == full)
    assert(folded(pmod(col("doc_id"), lit(3))) == full)
    assert(folded(pmod(col("doc_id") + 11, lit(7))) == full)
    // identities
    val empty = corpus.filter(lit(false))
    assert(folded(lit(1)) == full, "empty index: fold of the whole corpus is the full job")
    val idxOnly = Dedup.exactIncremental(Dedup.exact(corpus), empty).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(idxOnly == full, "empty delta: the index passes through unchanged")
    // new-docs view: nothing new when the index already holds everything
    assert(Dedup.exactIncrementalNew(Dedup.exact(corpus), corpus).isEmpty)
  }
}
