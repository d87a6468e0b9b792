package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProductFloat

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT
  * dot_product_float(a, b)")` works next to the Column API.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  * or
  *   --conf spark.sql.extensions=graft.GraftExtensions   // cluster-wide
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product_float expects 2 arguments, got ${children.length}")
        DotProductFloat(children.head, children(1))
      }))
  }
}
