package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Perceptual hashes over a binary media payload — the content-level
  * image near-dup signal the metadata parsers ([[ImageDimsKernel]] /
  * [[WavMetaKernel]]) cannot give: two re-encodes of the same picture
  * share no bytes but share GRADIENT STRUCTURE, which is what dHash
  * captures (and aHash's brightness mask approximates).
  *
  * The pixel-decode step is this container's documented codec seam
  * (no image libraries — [[graft.sources.MediaColumns]]): the
  * "grayscale thumbnail" here is a 9x8 BYTE-STRIDED sample of the
  * payload, `px(k) = payload[(k*len)/72] & 0xFF` for k in 0..71 — the
  * same byte==pixel stand-in convention the frame-sampling and
  * resize-stride oracles pin down. A real deployment swaps that one
  * line for decoder+luma+resize; everything downstream — the gradient
  * bit pack, the hamming-banded candidate join, the pair filter — is
  * the production dHash algorithm unchanged.
  *
  *  - dhash (64 bits): bit r*8+c set iff px(r*9+c+1) > px(r*9+c) —
  *    the sign of the horizontal gradient on a 9-wide/8-tall grid,
  *    invariant to global brightness/contrast shifts.
  *  - ahash (64 bits): over the leftmost 8x8 subgrid, bit r*8+c set
  *    iff 64*px > sum(px) — strictly-above-mean, kept integer-exact
  *    (no float mean) so both engines agree bit for bit.
  *
  * Payloads shorter than 72 bytes yield an all-null struct — garbage
  * tolerance, same contract as the header parsers: at 100 TB some
  * payloads WILL be stubs or corrupt, and hashing 3 bytes into a
  * "fingerprint" would only manufacture false near-dup pairs.
  */
object PerceptualHashKernel {

  val W = 9 // thumbnail columns (dHash compares horizontal neighbors)
  val H = 8 // thumbnail rows
  val N: Int = W * H

  val Schema: StructType = StructType(Seq(
    StructField("dhash", LongType, nullable = true),
    StructField("ahash", LongType, nullable = true)))

  def compute(p: Array[Byte]): InternalRow = {
    if (p.length < N) return new GenericInternalRow(Array[Any](null, null))
    val px = new Array[Int](N)
    val len = p.length.toLong
    var k = 0
    while (k < N) {
      px(k) = p(((k * len) / N).toInt) & 0xFF
      k += 1
    }
    var dhash = 0L
    var ahash = 0L
    var asum = 0L
    var r = 0
    while (r < H) {
      var c = 0
      while (c < 8) {
        if (px(r * W + c + 1) > px(r * W + c)) dhash |= 1L << (r * 8 + c)
        asum += px(r * W + c)
        c += 1
      }
      r += 1
    }
    r = 0
    while (r < H) {
      var c = 0
      while (c < 8) {
        if (64L * px(r * W + c) > asum) ahash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    new GenericInternalRow(Array[Any](dhash, ahash))
  }
}

/** struct(dhash, ahash) from a binary payload — one codegen'd call per
  * row into [[PerceptualHashKernel.compute]]; all-null struct for
  * payloads too short to fingerprint.
  */
case class PerceptualHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = PerceptualHashKernel.Schema
  override def prettyName: String = "perceptual_hash"

  override def nullSafeEval(p: Any): Any =
    PerceptualHashKernel.compute(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PerceptualHashKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PerceptualHashFunctions {
  def perceptualHash(payload: Column): Column =
    Bridge.column(PerceptualHash(Bridge.expression(payload)))
}
