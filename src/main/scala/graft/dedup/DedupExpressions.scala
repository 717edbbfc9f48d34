package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static eval target for [[WordShingles]] — shared by the interpreted and
  * codegen paths.
  */
object DedupOps {

  private val Empty = new GenericArrayData(Array.empty[Any])

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
