package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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

object expressions {
  import org.apache.spark.sql.graft.Bridge
  /** unaccent(col) — column-level accent folding. */
  def unaccent(c: Column): Column =
    Bridge.column(Unaccent(Bridge.expression(c)))
  /** simkey(col) — lower(unaccent(col)) without the ICU lower() path. */
  def simkey(c: Column): Column =
    Bridge.column(SimKey(Bridge.expression(c)))
}
