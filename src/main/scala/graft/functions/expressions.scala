package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding as a native Catalyst expression (SURVEY §2.9: "unaccent →
  * custom Expression (nullSafeEval + doGenCode)"). Codegen emits a direct
  * static call so the surrounding stage stays inside whole-stage codegen —
  * no UDF serialization, no fallback to interpreted projection.
  *
  * Reference behavior: `unidecode(name)` grouping key,
  * /root/reference/src/check_heuristics.py:23-42.
  */
case class Unaccent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Text.unaccent(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.Text.unaccent($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
}

/** Similarity key = unaccent + ROOT-locale lowercase in ONE codegen'd
  * expression. Exists for performance, not convenience: Spark 4's builtin
  * `lower()` routes through ICU collation support whose static initializer
  * is a minutes-long single-threaded stall on first use (observed via
  * jstack: 31 executor threads parked on the CollationAwareUTF8String class
  * init monitor). Keeping the canonicalization path on JVM String.toLowerCase
  * avoids ICU entirely.
  */
case class SimKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Text.simKey(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.Text.simKey($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): SimKey =
    copy(child = newChild)
}

/** Column form of [[graft.functions.Text.tokenKey]] — the tokenizer's own
  * equivalence key (lowercased word-char tokens, space-joined). Used by the
  * F5 provenance rider: a score-1.0 mention's sliced span must tokenKey-match
  * its surface whether it came from the exact automaton (verbatim slice) or
  * the token-fuzzy recall path (case/punctuation variant at ratio 1.0).
  */
case class TokenKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Text.tokenKey(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.Text.tokenKey($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): TokenKey =
    copy(child = newChild)
}

/** Static eval target for [[RegexFindAll]] — shared by interpreted and
  * codegen paths (the compiled Pattern rides in as a codegen reference
  * object, so the regex compiles once per plan, not per row).
  */
object RegexOps {
  def findAll(s: String, p: java.util.regex.Pattern): ArrayData = {
    val m = p.matcher(s)
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (m.find()) {
      buf += InternalRow(UTF8String.fromString(m.group()), m.start(), m.end())
    }
    new GenericArrayData(buf.toArray[Any])
  }
}

/** Python str.title() byte parity as a codegen'd expression (P2) — same
  * ICU-avoidance rationale as [[SimKey]] (builtin initcap routes through the
  * collation-aware path, and its word model differs from Python's anyway:
  * apostrophes/hyphens/digits restart words in Python).
  */
case class PyTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Text.pyTitle(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.Text.pyTitle($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): PyTitle =
    copy(child = newChild)
}

/** NL date parse (the grammar in [[Dates.parse]]) as a native Catalyst
  * expression returning DateType, null when the grammar rejects or fields
  * are out of range (parse-success filter F4). A column-expression tree of
  * the same grammar (4 rlike + 12 regexp_extract over a shared normalized
  * input) generates >64 KB per codegen method and falls Janino back to
  * interpreted mode — one static call with statically-compiled patterns is
  * both smaller and faster.
  */
case class DateParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DateType
  // null is a REJECT verdict, produced even for non-null input — without
  // this, Catalyst folds IsNotNull(dateParse(x)) to true and codegen gets a
  // constant isNull slot.
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Dates.parseToDaysBoxed(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Integer ${ev.value}_r = graft.functions.Dates.parseToDaysBoxed($c.toString());
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): DateParse =
    copy(child = newChild)
}

/** All regex matches with character offsets, as a native Catalyst
  * expression: `regex_find_all(text) → array<struct<surface,start,end>>`.
  * Spark has regexp_extract_all (no positions); the reference needs
  * positioned occurrences (`find_all_occurrences`,
  * /root/reference/src/methods/DateParser.py:19-31), so this emits
  * (match, start, end-exclusive) in Java char offsets. Codegen is a direct
  * static call — the surrounding stage stays in whole-stage codegen.
  */
case class RegexFindAll(child: Expression, pattern: String) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("surface", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))), containsNull = false)

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(v: Any): Any =
    RegexOps.findAll(v.asInstanceOf[UTF8String].toString, compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled, "java.util.regex.Pattern")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RegexOps.findAll($c.toString(), $patRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexFindAll =
    copy(child = newChild)
}

object expressions {
  import org.apache.spark.sql.graft.Bridge
  /** unaccent(col) — column-level accent folding. */
  def unaccent(c: Column): Column =
    Bridge.column(Unaccent(Bridge.expression(c)))
  /** simkey(col) — lower(unaccent(col)) without the ICU lower() path. */
  def simkey(c: Column): Column =
    Bridge.column(SimKey(Bridge.expression(c)))
  /** tokenkey(col) — the tokenizer's equivalence key (Text.tokenKey). */
  def tokenkey(c: Column): Column =
    Bridge.column(TokenKey(Bridge.expression(c)))
  /** regexFindAll(col, pattern) — every match with char offsets. */
  def regexFindAll(c: Column, pattern: String): Column =
    Bridge.column(RegexFindAll(Bridge.expression(c), pattern))
  /** dateParse(col) — NL date grammar → DateType (null = reject). */
  def dateParse(c: Column): Column =
    Bridge.column(DateParse(Bridge.expression(c)))
  /** pyTitle(col) — Python str.title() byte parity. */
  def pyTitle(c: Column): Column =
    Bridge.column(PyTitle(Bridge.expression(c)))
}
