package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Config

/** Deduplication suite for a large-scale training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard similarity join, MinHash+LSH banded join,
  * SimHash fingerprinting, embedding-cosine near-dup.
  *
  * Default hashing is md5-based so the DuckDB oracle reproduces results
  * exactly (md5 hex strings compare identically in both engines; a
  * lexicographic min of hashes is a valid MinHash). The production hash
  * family is selectable (Config.MinHashFn = "xxhash64"): 8-byte long
  * signatures instead of 32-byte hex strings in the shuffle, same plan
  * shape; DedupSpec asserts the structural equivalences (precision, planted
  * recall, recall floor — band recall near the threshold is family-
  * dependent by nature).
  */
object Dedup {

  val ShingleN = 5

  /** Dedup test corpus: normalized documents ∪ planted near-dups (10%-suffix
    * truncation of every 5th doc) ∪ planted exact dups (copy of every 7th
    * doc). Deterministic and mirrored in the oracle SQL.
    */
  def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
    val near = norm.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, (length(text)*9) div 10)").as("text"))
    val exact = norm.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    // NOT spread here: cheap consumers (exact-dedup's md5 groupBy, the
    // count-shaped simhash scan) measured the rebalance exchange as pure
    // cost. The heavy shingle/fingerprint paths spread their OWN input
    // (shingles / shingleHashes / simhashCandidates below).
    norm.unionByName(near).unionByName(exact)
  }

  /** Exact dedup: content-hash groupBy. (hash, n_docs, keeper=min id). */
  def exact(corpus: DataFrame): DataFrame =
    corpus.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))

  /** Incremental exact dedup — the production shape at 100 TB: fold a
    * delta batch into a persisted fingerprint index (`h, n_docs, keeper`,
    * the [[exact]] schema) WITHOUT rescanning the historical corpus. The
    * delta collapses first in its own map-side-combinable groupBy, then
    * merges with the index in one hash-keyed aggregation — (count, min)
    * are associative-commutative, so for ANY split
    * `exactIncremental(exact(a), b) == exact(a ∪ b)` exactly (DedupSpec
    * property; q_dedup_incr hash-matches the full-corpus oracle). Cost is
    * delta-proportional: the index side moves through one shuffle of
    * dimension rows (or none, when the persisted index is bucketed by
    * `h`), never through the historical document corpus.
    */
  def exactIncremental(index: DataFrame, delta: DataFrame): DataFrame =
    foldIndex(index, exact(delta))

  /** The delta documents that survive incremental dedup: the first (min
    * doc_id) occurrence of each content hash NOT already in the index —
    * what a training pipeline actually appends to the corpus. Hash-keyed
    * anti-join after the delta-local collapse, delta-proportional.
    */
  def exactIncrementalNew(index: DataFrame, delta: DataFrame): DataFrame =
    newAgainst(index, exact(delta))

  /** Stats-level fold: merge already-collapsed delta stats ([[exact]]
    * schema) into the index. Exposed so a caller taking BOTH the fold and
    * the new-docs view (e.g. `Submit dedup`) collapses the delta once. */
  def foldIndex(index: DataFrame, deltaStats: DataFrame): DataFrame =
    index.select(col("h"), col("n_docs"), col("keeper"))
      .unionByName(deltaStats)
      .groupBy(col("h"))
      .agg(sum(col("n_docs")).as("n_docs"), min(col("keeper")).as("keeper"))

  /** Stats-level new-docs view, same contract as [[exactIncrementalNew]]. */
  def newAgainst(index: DataFrame, deltaStats: DataFrame): DataFrame =
    deltaStats.join(index.select(col("h")), Seq("h"), "left_anti")
      .select(col("h"), col("keeper").as("doc_id"))

  /** Distinct word-5-gram shingles per doc — ONE native pass per document
    * ([[WordShingles]]; the prior split → transform/slice/concat_ws HOF
    * form evaluated interpreted and allocated a token slice per shingle).
    * Documents with fewer than [[ShingleN]] tokens emit an empty array,
    * which explode drops.
    */
  def shingles(corpus: DataFrame): DataFrame =
    // shingling + the distinct's partial aggregate (and, downstream, the
    // 12-seed MinHash md5 per shingle) run in the scan stage — spread a
    // coarsely-split corpus over the cores first (guide §2.5; measured a
    // 1.2 s THREE-task MinHash map stage at local[32] without it)
    graft.util.Reads.spread(corpus)
      .select(col("doc_id"), explode(org.apache.spark.sql.graft.Bridge.column(
        WordShingles(org.apache.spark.sql.graft.Bridge.expression(col("text")), ShingleN)
      )).as("s"))
      .distinct()

  /** [[shingles]] with each shingle collapsed to its 64-bit xxhash64
    * fingerprint inside the generating pass ([[WordShingleHashes]]) — the
    * key every Jaccard-path exchange and join then moves as an 8-byte long
    * instead of a ~40-byte string (guide §2.3 "narrower types"), and the
    * distinct aggregate hashes longs instead of strings. Jaccard arithmetic
    * is unchanged unless two DISTINCT corpus shingles collide in 64 bits
    * (birthday bound ≈ n²/2⁶⁵ ≈ 10⁻⁷ at the ~3M-shingle bench corpus; the
    * driver's DuckDB gate hash-matches all SFs, and 64-bit shingle
    * fingerprints are the standard construction for web-scale dedup).
    * The MinHash SIGNATURE path keeps string shingles — its md5 family is
    * oracle-mirrored — but its verify stage shares this key.
    */
  def shingleHashes(corpus: DataFrame): DataFrame =
    graft.util.Reads.spread(corpus) // see shingles
      .select(col("doc_id"), explode(org.apache.spark.sql.graft.Bridge.column(
        WordShingleHashes(org.apache.spark.sql.graft.Bridge.expression(col("text")), ShingleN)
      )).as("s"))
      .distinct()

  /** Exact-Jaccard verification DRIVEN BY the candidate set: intersection
    * counts come from cand ⋈ shingles(a) ⋈ shingles(b) — cost linear in
    * |candidates| × shingles-per-doc. (Round 1 enumerated ALL pairs sharing
    * a shingle and only then semi-joined candidates, so even the LSH path
    * paid the quadratic inverted-index join.)
    */
  private def jaccardVerify(sh: DataFrame, cand: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("a"), col("s")), "a")
      .join(sh.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double") >= Config.JaccardThreshold)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
  }

  /** Informative-shingle universe: shingles held by more than `maxDf` docs
    * are removed entirely (a stop-phrase shingle shared by millions of docs
    * makes the inverted-index self-join quadratic in that posting list —
    * the standard fix is to drop hot shingles before indexing; a ≥0.8-
    * Jaccard pair shares ~80 % of its shingles, so recall barely moves).
    * Jaccard is then exact over this universe. Mirrored in the oracle.
    */
  private def informativeShingles(sh: DataFrame, maxDf: Long): DataFrame = {
    val cold = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("s"))
    sh.join(cold, Seq("s"), "left_semi")
  }

  /** Near-dup pairs by exact n-gram Jaccard ≥ 0.8 over the df-capped shingle
    * universe: one inverted-index self-join + count verification (single
    * pass — candidates and intersection counts come from the same join).
    * Integer outputs (inter, na, nb) keep the oracle compare float-free.
    */
  def ngramJaccard(corpus: DataFrame, maxDf: Long = Config.MaxShingleDf): DataFrame = {
    val sh = informativeShingles(shingleHashes(corpus), maxDf)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("a"), col("s"))
      .join(sh.select(col("doc_id").as("b"), col("s")), Seq("s"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double") >= Config.JaccardThreshold)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
  }

  /** MinHash signatures, one row per doc: k=12 min aggregates computed in a
    * SINGLE groupBy — no seed explode (round 1 shuffled every shingle 12×
    * through an exploded (doc, seed) key and needed a second groupBy to
    * pivot). Each `min(hash(i, s))` is codegen'd and map-side combinable;
    * the only shuffle is one row of 12 values per doc. `hashFn` selects the
    * family (Config.MinHashFn): md5 hex strings for oracle parity, xxhash64
    * longs for production shuffle width.
    */
  def minhashSignature(sh: DataFrame, hashFn: String = Config.MinHashFn): DataFrame = {
    val sigCols = (0 until Config.MinHashK).map(i => min(seedHash(i, hashFn)).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  private def seedHash(i: Int, hashFn: String): org.apache.spark.sql.Column = hashFn match {
    case "md5"      => md5(concat(lit(s"$i:"), col("s")))
    case "xxhash64" => xxhash64(lit(i), col("s"))
    case other      => throw new IllegalArgumentException(s"unknown minhash family: $other")
  }

  /** LSH candidates: band keys = concat of r=3 adjacent signature slots;
    * pairs sharing any band key. The banded self-join is the scale path —
    * candidate count is bounded by bucket sizes, never all-pairs.
    */
  def minhashCandidates(sh: DataFrame, hashFn: String = Config.MinHashFn): DataFrame = {
    val r = Config.MinHashRows
    val sig = minhashSignature(sh, hashFn)
    def bandKey(b: Int): org.apache.spark.sql.Column = {
      val cols = (0 until r).map(i => col(s"h${b * r + i}"))
      // md5 keeps the bare hex concat (oracle-mirrored, qCanonMinhash);
      // longs need a separator so (1, 23) never collides with (12, 3)
      if (hashFn == "md5") concat(cols: _*)
      else concat_ws(":", cols.map(_.cast("string")): _*)
    }
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until Config.MinHashBands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*
    )).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** MinHash LSH near-dup: banded candidates verified with exact Jaccard.
    * Signatures/bands run over string shingles (the md5 family is
    * oracle-mirrored); verification joins/counts over the 64-bit shingle
    * fingerprints derived from the SAME distinct set, so the candidate
    * pipeline and the verify pipeline agree on the shingle universe while
    * the verify exchanges move longs.
    */
  def minhashLsh(corpus: DataFrame, hashFn: String = Config.MinHashFn): DataFrame = {
    val sh = shingles(corpus)
    jaccardVerify(sh.select(col("doc_id"), xxhash64(col("s")).as("s")),
      minhashCandidates(sh, hashFn))
  }

  /** SimHash (64-bit) per doc over the distinct-token set: bit b of a token
    * = bit b of the first 16 hex chars of md5(token); document bit = sign of
    * Σ(±1). Emitted as a 64-char bit string (engine-portable; packs to a
    * long with bit ops at the storage layer).
    *
    * One native map expression ([[SimHash64]]) — the fingerprint is a
    * document-local aggregate, so it never shuttles token rows through a
    * shuffle. The previous aggregate form (explode → distinct → 64 sum
    * aggregates) is kept in DedupScaleBench as the measured baseline: it
    * shuffled every token row twice and ran 64 substring+conv string ops
    * per token (BENCH/dedup_scale.json).
    */
  def simhash(corpus: DataFrame): DataFrame =
    // null-text docs drop entirely — the explode(split(text))-form verdict
    // (and the oracle's unnest), not a (doc_id, NULL) row
    corpus.filter(col("text").isNotNull)
      .select(col("doc_id"), org.apache.spark.sql.graft.Bridge.column(
        SimHash64(org.apache.spark.sql.graft.Bridge.expression(col("text"))))
        .as("simhash"))

  /** SimHash near-dup pairs at Hamming distance ≤ k (default 3) — the
    * classic web-scale near-duplicate query over the fingerprints (Manku,
    * Jain & Das Sarma, WWW'07: detecting near-duplicates for web crawling).
    * The 64-bit fingerprint splits into b contiguous blocks; a pair at
    * Hamming ≤ k differs in at most k blocks, so by pigeonhole it agrees
    * EXACTLY on some (b−k)-block combination (WWW'07 §3's table scheme, as
    * an equi self-join emitting one match key per combination) — total
    * recall, and exact bit_count verification keeps precision exact, so the
    * output is identical to brute all-pairs (which is what the DuckDB
    * oracle computes). b tunes key width against key count: the minimal
    * b = k+1 (one 16-bit band per key at k=3) probes nBands·n²/2¹⁷ random
    * key collisions — measured 1.2×10⁸ candidates at 2M docs, already 10⁴×
    * the true-pair count and growing quadratically; b = 6 spends
    * C(6,3) = 20 keys of ~32 bits each, so random collisions stay
    * ~20·n²/2³³ (measured ~10⁴ at 2M docs) and the join is output-bound
    * through the 10⁸-doc regime (BENCH/dedup_scale.json carries both
    * schemes' candidate counts and times; at 2M docs they tie on wall-clock
    * — the 2¹⁷ key space still swallows the collisions at that n — so the
    * committed default is chosen by the measured candidate growth, not the
    * sandbox timing). Beyond 10⁸ docs, widen the fingerprint (128-bit
    * SimHash) rather than adding combinations — same plan shape, bigger key
    * space.
    */
  def simhashPairs(corpus: DataFrame,
                   maxHamming: Int = Config.SimHashMaxHamming,
                   nBlocks: Int = Config.SimHashBlocks): DataFrame =
    simhashCandidates(corpus, maxHamming, nBlocks)
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** The candidate join feeding [[simhashPairs]] — every (b−k)-combination
    * key collision with its exact Hamming distance, BEFORE the radius
    * filter. Exposed so the scale bench can measure the candidate volume
    * (the quadratically-growing term the block-count choice controls).
    */
  private[graft] def simhashCandidates(corpus: DataFrame,
                                       maxHamming: Int,
                                       nBlocks: Int): DataFrame = {
    require(nBlocks > maxHamming && nBlocks <= 32,
      s"need maxHamming < nBlocks <= 32, got k=$maxHamming b=$nBlocks")
    // contiguous blocks, none spanning the x1/x2 packing boundary: each
    // 32-bit half splits into ⌈b/2⌉ / ⌊b/2⌋ near-even widths
    val nb1 = (nBlocks + 1) / 2
    def widths(n: Int) = Seq.tabulate(n)(i => 32 / n + (if (i < 32 % n) 1 else 0))
    val blocks: Seq[(String, Int, Int)] = // (packed half, right-shift, width)
      for ((half, ws) <- Seq("x1" -> widths(nb1), "x2" -> widths(nBlocks - nb1));
           (w, off) <- ws.zip(ws.scanLeft(0)(_ + _)))
        yield (half, 32 - off - w, w)
    // one match key per (b−k)-combination: literal shift/mask arithmetic
    // concatenating the chosen blocks, all codegen'd
    val keyCols = blocks.indices.combinations(nBlocks - maxHamming).toSeq.map {
      idxs =>
        idxs.foldLeft(lit(0L)) { (acc, i) =>
          val (half, sh, w) = blocks(i)
          shiftleft(acc, w).bitwiseOR(
            shiftright(col(half), sh).bitwiseAND(lit((1L << w) - 1)))
        }
    }
    // pack the bit string into two longs once, pre-join, so verification is
    // two codegen'd xor+bit_count ops per candidate instead of 64 char cmps.
    // The SimHash fingerprint pass is the heavy map work of this query —
    // spread a coarsely-split corpus over the cores first (guide §2.5)
    val packed = simhash(graft.util.Reads.spread(corpus))
      .select(col("doc_id"),
        conv(substring(col("simhash"), 1, 32), 2, 10).cast("long").as("x1"),
        conv(substring(col("simhash"), 33, 32), 2, 10).cast("long").as("x2"))
      .select(col("doc_id"), col("x1"), col("x2"),
        posexplode(array(keyCols: _*)).as(Seq("combo", "key")))
    packed.as("x").join(packed.as("y"),
        col("x.combo") === col("y.combo") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (expr("bit_count(x.x1 ^ y.x1)") + expr("bit_count(x.x2 ^ y.x2)"))
          .cast("long").as("hamming"))
  }

  /** Embedding near-dup corpus: base vectors (as double) ∪ planted
    * near-identical variants (first component +0.01) for every 10th vector.
    */
  def embCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val variant = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("concat(array(element_at(v, 1) + 0.01d), slice(v, 2, size(v) - 1))").as("v"))
    base.unionByName(variant) // not spread — see Ann.embeddings
  }

  /** Cosine similarity between two double-array columns as a codegen'd
    * higher-order-function expression (no UDF): Σxy / √(Σx²·Σy²).
    */
  def cosineExpr(a: String, b: String): org.apache.spark.sql.Column = {
    // native DotD loops (dot(a,a) is the same index-order x*x fold the
    // aggregate form computed); divide/sqrt stay builtin codegen'd ops
    def dot(x: String, y: String) = graft.similarity.Ann.unitDot(x, y)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.99) — brute all-pairs. Kept
    * as the recall oracle for the LSH path (AnnSpec asserts LSH ⊆ brute and
    * brute's planted pairs ⊆ LSH); the wired query runs [[embeddingNearDup]]
    * which takes the banded-LSH scale path.
    */
  def embeddingNearDupBrute(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.similarity.Ann.withUnit(embCorpus(spark, sfDir))
    val l = e.select(col("vec_id").as("a"), col("nv").as("na"))
    val r = e.select(col("vec_id").as("b"), col("nv").as("nb"))
    l.join(r, col("a") < col("b"))
      .filter(graft.similarity.Ann.unitDot("na", "nb") >= 0.99)
      .select(col("a"), col("b"))
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.99), SRP-LSH banded
    * candidates + exact unit-dot verification — the 100-TB path (all-pairs
    * was 72 % of the round-1 bench). Driver-verified against the brute
    * DuckDB oracle, so recall on this corpus is gate-checked every round.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame =
    graft.similarity.Ann.lshPairs(embCorpus(spark, sfDir), minCos = 0.99)
}
