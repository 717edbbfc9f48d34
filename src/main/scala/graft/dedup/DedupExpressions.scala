package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static eval target for [[WordShingles]] / [[SimHash64]] — shared by the
  * interpreted and codegen paths.
  */
object DedupOps {

  private val Empty = new GenericArrayData(Array.empty[Any])

  private val threadMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // Executor-wide memo of a token's SimHash contribution (the first 8 md5
  // bytes packed big-endian — the only part [[simhash64]] reads): natural-
  // language tokens repeat heavily across documents, so most per-token md5
  // work is recomputation. Size-bounded (~4M entries ≈ low hundreds of MB
  // worst case) — past the cap new tokens are computed but not stored, so
  // a pathological vocabulary degrades to the uncached cost, never OOM.
  // Pure memoization: the cached value is a deterministic function of the
  // token, so results are bit-identical with or without hits.
  private val tokenBits = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val TokenBitsCap = 1 << 22

  @inline private def md5Bits(tok: String): Long = {
    val cached = tokenBits.get(tok)
    if (cached != null) cached.longValue()
    else {
      val md = threadMd5.get()
      md.reset()
      val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var bits = 0L
      var i = 0
      while (i < 8) { bits = (bits << 8) | (d(i) & 0xffL); i += 1 }
      if (tokenBits.size < TokenBitsCap) tokenBits.put(tok, bits)
      bits
    }
  }

  /** 64-bit SimHash of `text` as a 64-char bit string, in one pass: split on
    * single spaces (keep-trailing semantics, as [[wordShingles]]), dedupe
    * tokens, and for each DISTINCT token add ±1 per bit of the first 8 bytes
    * of md5(token) — bit b of the fingerprint is 1 iff its sum is > 0.
    * Bit b = bit (7 − b%8) of digest byte b/8, which is exactly the column
    * form's `shiftright(conv(substring(hex, b/4+1, 1), 16, 10), 3 − b%4) & 1`
    * read off the raw digest instead of its hex rendering.
    */
  def simhash64(text: UTF8String): UTF8String = {
    val s = text.toString
    val len = s.length
    val seen = new java.util.HashSet[String]()
    val sums = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        if (seen.add(tok)) {
          // bit b of the fingerprint = bit (7 − b%8) of digest byte b/8 =
          // bit (63 − b) of the big-endian-packed first 8 bytes (md5Bits)
          val bits = md5Bits(tok)
          var b = 0
          while (b < 64) {
            sums(b) += ((((bits >>> (63 - b)) & 1L).toInt) << 1) - 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Char](64)
    var b = 0
    while (b < 64) { out(b) = if (sums(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromString(new String(out))
  }

  /** All word n-gram shingles of `text` in one pass, under
    * split-on-single-space token semantics (each ' ' is a separator;
    * leading/adjacent/trailing separators delimit empty tokens, as
    * `split(text, " ")` with Spark's keep-trailing limit does). Shingle i
    * is the substring from the start of token i to the end of token
    * i+n−1 — identical to `concat_ws(' ', slice(w, i+1, n))`, because the
    * separators inside that span are single spaces. Fewer than n tokens →
    * empty array (the caller's `size(w) >= n` filter verdict).
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    // token start offsets: 0 and every position after a space
    var nTokens = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return Empty
    val starts = new Array[Int](nTokens)
    var t = 1
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](nTokens - n + 1)
    i = 0
    while (i <= nTokens - n) {
      // end of token i+n−1: one char before the start of token i+n
      val end = if (i + n < nTokens) starts(i + n) - 1 else len
      out(i) = UTF8String.fromString(s.substring(starts(i), end))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[wordShingles]] collapsed to 64-bit fingerprints in place: each
    * shingle is hashed DIRECTLY from the UTF-8 byte range of the document
    * (xxhash64 with Spark's seed 42, so the value equals
    * `xxhash64(<shingle string>)`) — zero per-shingle string allocation.
    * Byte-offset token scanning is safe because ' ' (0x20) never occurs
    * inside a UTF-8 multi-byte sequence.
    */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val nBytes = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var nTokens = 1
    var i = 0
    while (i < nBytes) { if (text.getByte(i) == ' '.toByte) nTokens += 1; i += 1 }
    if (nTokens < n) return Empty
    val starts = new Array[Int](nTokens)
    var t = 1
    i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](nTokens - n + 1)
    i = 0
    while (i <= nTokens - n) {
      val end = if (i + n < nTokens) starts(i + n) - 1 else nBytes
      out(i) = java.lang.Long.valueOf(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, off + starts(i), end - starts(i), 42L))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text) → array<string>`: every word n-gram of a
  * whitespace-normalized document in one pass over the string.
  *
  * Exists for performance, not convenience: the column form
  * (`split` → `transform(sequence(…), i -> concat_ws(' ', slice(w, i, n)))`)
  * materializes the token array, then runs an interpreted higher-order
  * function that allocates an index sequence, a token-slice array, and a
  * joined string per shingle — CodegenFallback on the map side of every
  * text-dedup path (MinHash, n-gram Jaccard). One native node emits each
  * shingle as a substring between two precomputed token offsets
  * (BENCH/dedup_scale.json; same rationale as
  * [[graft.similarity.SrpKeys]]).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    DedupOps.wordShingles(text.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.DedupOps.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `simhash64(text) → 64-char bit string`: the whole SimHash fingerprint as
  * one map-side pass over the document.
  *
  * Exists for performance, not convenience: the aggregate form (explode
  * tokens → distinct → md5 → 64 sum aggregates) shuffles every token row
  * through the distinct and evaluates 64 `substring+conv` string ops per
  * token in the groupBy — ~5×10⁹ string ops and an 80M-row shuffle at 2M
  * docs, which dominated the near-dup pair bench (BENCH/dedup_scale.json).
  * One native node computes the fingerprint per document with zero shuffle:
  * the distinct-token set is document-local by definition, so the aggregate
  * never needed to leave the row.
  */
/** `word_shingle_hashes(text) → array<long>`: [[WordShingles]] with every
  * shingle collapsed to its xxhash64 fingerprint inside the same pass —
  * the shingle key the Jaccard dedup paths join and aggregate on (guide
  * §2.3 "narrower types": 8-byte longs through every exchange instead of
  * ~40-byte shingle strings, and no per-shingle string allocation on the
  * map side). Values equal `xxhash64(shingle)` so tests can cross-check
  * against the string form.
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    DedupOps.wordShingleHashes(text.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.DedupOps.wordShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(text: Any): Any =
    DedupOps.simhash64(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.DedupOps.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
