package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per
  * group with an O(k) sorted buffer — the UDAF-shaped alternative to
  * `row_number().over(window) <= k` (SURVEY.md par.7 candidate
  * "TypedImperativeAggregate for top-k-by-similarity").
  *
  * When to prefer which: the window form benefits from Catalyst's
  * WindowGroupLimit pushdown and stays fully codegen'd — use it in SQL
  * pipelines. This Aggregator wins in typed `Dataset` flows and when the
  * downstream wants the top-k AS A LIST per key (no re-grouping), and its
  * partial-merge shape (buffers capped at k on both sides of every
  * merge) shuffles at most k rows per group per partition, same as the
  * pushed-down window.
  *
  * Ordering: score descending, id ascending on ties — identical to
  * [[graft.operators.Sessionize.topKPerKey]].
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    // total order via Double.compare so NaN sorts GREATEST — matching
    // Spark's ORDER BY cosine DESC (NaN first), which the window-ranked
    // twin query relies on; plain > would silently drop NaN scores
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length == k && !better(in, buf.last)) buf
    else {
      val (before, after) = buf.span(better(_, in))
      (before :+ in) ++ after.take(k - before.length - 1)
    }
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
