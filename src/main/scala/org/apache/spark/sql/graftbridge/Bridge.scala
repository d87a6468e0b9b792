package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column <-> Expression bridge.
  * Custom Catalyst expressions (graft.functions) need to surface as
  * `Column`s; Spark 4 routes that through
  * org.apache.spark.sql.classic.ExpressionUtils, which is sql-private, so
  * this one-file shim lives under the org.apache.spark.sql package. No
  * other Spark internals are touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
