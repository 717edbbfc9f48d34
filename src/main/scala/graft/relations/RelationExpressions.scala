package graft.relations

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static eval target for [[CoocPairs]] — shared by the interpreted and
  * codegen paths (the rule table rides in as a codegen reference object).
  */
object RelOps {

  /** All co-occurrence triples of one segment's distinct (label, surface)
    * mention set, every rule in one pass: for rule (sl, pred, ol), each
    * first-appearance-distinct surface labeled `sl` pairs with each
    * first-appearance-distinct surface labeled `ol`, subject-major — the
    * exact verdict and order of the
    * `explode(rules) → filter/transform/array_distinct → flatten` column
    * form it replaced. Entries with a null label or surface are dropped
    * (the SQL filter's null-comparison verdict; they never occur — Mention
    * fields are non-null).
    *
    * Surfaces are cloned into the output rows: the input array may be
    * backed by a buffer the upstream aggregate reuses across rows.
    */
  def coocPairs(ms: ArrayData, rules: Array[Array[String]]): ArrayData = {
    val n = ms.numElements()
    val labels = new Array[UTF8String](n)
    val surfs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      if (row != null) {
        labels(i) = row.getUTF8String(0)
        surfs(i) = row.getUTF8String(1)
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var r = 0
    while (r < rules.length) {
      val sl = UTF8String.fromString(rules(r)(0))
      val pred = UTF8String.fromString(rules(r)(1))
      val ol = UTF8String.fromString(rules(r)(2))
      val subjs = distinctWithLabel(labels, surfs, sl)
      if (subjs.nonEmpty) {
        val objs = distinctWithLabel(labels, surfs, ol)
        var s = 0
        while (s < subjs.length) {
          var o = 0
          while (o < objs.length) {
            out += new GenericInternalRow(
              Array[Any](subjs(s).clone(), pred, objs(o).clone()))
            o += 1
          }
          s += 1
        }
      }
      r += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Surfaces under `label`, distinct, first-appearance order. */
  private def distinctWithLabel(labels: Array[UTF8String],
      surfs: Array[UTF8String], label: UTF8String): Array[UTF8String] = {
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < labels.length) {
      if (labels(i) != null && surfs(i) != null && labels(i).equals(label))
        seen.add(surfs(i))
      i += 1
    }
    seen.toArray(new Array[UTF8String](seen.size()))
  }
}

/** `cooc_pairs(ms) → array<struct<subj,pred,obj>>`: every rule's
  * subject×object pairing of one segment's (label, surface) mention set in
  * one pass.
  *
  * Exists for performance, not convenience: the column form exploded the
  * rule table (3× row blow-up before any filtering) and ran four
  * higher-order functions plus two array_distincts per rule-row — all
  * CodegenFallback, so the flagship's pairing stage evaluated interpreted
  * and broke the post-aggregate stage's whole-stage codegen. One native
  * node keeps the stage codegen'd and the pairing a single pass
  * (BENCH/r5_cooc_expr.json; same rationale as [[graft.similarity.SrpKeys]]).
  */
case class CoocPairs(child: Expression, rules: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false))), containsNull = false)
  override def nullSafeEval(ms: Any): Any =
    RelOps.coocPairs(ms.asInstanceOf[ArrayData], rules)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rules", rules, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.relations.RelOps.coocPairs($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): CoocPairs =
    copy(child = newChild)
}
