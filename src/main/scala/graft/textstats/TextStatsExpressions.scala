package graft.textstats

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static eval targets for the per-document text-stat expressions — shared
  * by the interpreted and codegen paths (marker/stopword tables ride in as
  * codegen reference objects).
  *
  * Tokenization contract, pinned to the column form it replaced:
  * `split(lower(text), " ")` — ROOT-locale lowercase then split on single
  * spaces keeping empties (`documents()` pre-collapses whitespace, so
  * tokens are clean); token membership is exact string equality against
  * ASCII marker/stopword tables (any locale-mapping divergence on
  * non-ASCII tokens cannot produce an ASCII table hit, so JVM vs ICU
  * lowercasing agree on every membership verdict); token length is in
  * code points (= Spark `length()`).
  */
object TextStatsOps {

  /** (winnerLangIndex, winnerHits) over the marker tables; winner = max
    * hits, ties → LOWEST index (tables are passed lang-code-ascending);
    * (-1, 0) when nothing hits.
    */
  def langBest(text: UTF8String, tables: Array[java.util.HashSet[String]]): InternalRow = {
    val counts = new Array[Long](tables.length)
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var from = 0
    val len = s.length
    while (from <= len) {
      val sp = s.indexOf(' ', from)
      val end = if (sp < 0) len else sp
      val t = s.substring(from, end)
      var l = 0
      while (l < tables.length) {
        if (tables(l).contains(t)) counts(l) += 1L
        l += 1
      }
      from = end + 1
    }
    var best = -1
    var bestHits = 0L
    var l = 0
    while (l < tables.length) {
      if (counts(l) > bestHits) { bestHits = counts(l); best = l }
      l += 1
    }
    InternalRow(best, bestHits)
  }

  /** (stopword count, longest token in code points) in one pass — the
    * lowercase stream feeds membership, the raw stream feeds length (the
    * two column HOFs it replaces tokenized twice).
    */
  def qualityStats(text: UTF8String, stop: java.util.HashSet[String]): InternalRow = {
    val raw = text.toString
    val low = raw.toLowerCase(java.util.Locale.ROOT)
    var nStop = 0L
    var from = 0
    val len = low.length
    while (from <= len) {
      val sp = low.indexOf(' ', from)
      val end = if (sp < 0) len else sp
      if (stop.contains(low.substring(from, end))) nStop += 1L
      from = end + 1
    }
    var maxLen = 0L
    from = 0
    val rlen = raw.length
    while (from <= rlen) {
      val sp = raw.indexOf(' ', from)
      val end = if (sp < 0) rlen else sp
      val cp = raw.codePointCount(from, end).toLong
      if (cp > maxLen) maxLen = cp
      from = end + 1
    }
    InternalRow(nStop, maxLen)
  }

  def toSet(words: Array[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.length * 2)
    words.foreach(s.add)
    s
  }
}

/** `lang_best(text) → struct<lang_idx:long, hits:long>` — marker-token
  * language ID as ONE narrow map expression. The column form exploded
  * every token into a broadcast join, shuffled the hits for a per-doc
  * aggregation, ran a ranking window, and joined back to the doc table —
  * four wide stages for what is logically a per-row argmax. At web scale
  * the explode alone multiplies the scan by the token count; this node
  * keeps language ID inside the document scan's codegen stage with zero
  * shuffles (PLANS.md q_langid).
  */
case class LangBest(child: Expression, langs: Array[String],
    markerTables: Array[Array[String]]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang_idx", org.apache.spark.sql.types.IntegerType, nullable = false),
    StructField("hits", LongType, nullable = false)))

  @transient private lazy val tables = markerTables.map(TextStatsOps.toSet)

  override def nullSafeEval(v: Any): Any =
    TextStatsOps.langBest(v.asInstanceOf[UTF8String], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerTables", tables, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.textstats.TextStatsOps.langBest($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangBest =
    copy(child = newChild)
}

/** `quality_stats(text) → struct<n_stop:long, max_token_len:long>` — the
  * two per-row HOFs of the quality query (stopword filter over a literal
  * array, aggregate-greatest token length) as one codegen'd pass;
  * higher-order functions are CodegenFallback and both re-tokenized the
  * document interpreted.
  */
case class QualityStats(child: Expression, stopwords: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_stop", LongType, nullable = false),
    StructField("max_token_len", LongType, nullable = false)))

  @transient private lazy val stopSet = TextStatsOps.toSet(stopwords)

  override def nullSafeEval(v: Any): Any =
    TextStatsOps.qualityStats(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.textstats.TextStatsOps.qualityStats($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): QualityStats =
    copy(child = newChild)
}
