package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved these converters behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils); a shim in
  * an org.apache.spark.sql subpackage is the standard extension pattern for
  * libraries that define native Catalyst expressions (cf. SNIPPETS.md [3],
  * public Qbeast DatasetFactory).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
