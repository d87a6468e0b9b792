package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Content-level audio fingerprint over a binary payload — the audio
  * twin of [[PerceptualHashKernel]]'s dHash: where an image re-encode
  * preserves gradient STRUCTURE, an audio re-encode (or gain change)
  * preserves the ENERGY ENVELOPE, and the sign of the envelope's slope
  * is what this packs into 64 bits (the chromaprint/shazam family's
  * core trick, reduced to one band).
  *
  * The sample-decode step is the same documented codec seam as the
  * image hashes (no audio libraries in this container —
  * [[graft.sources.MediaColumns]]): "samples" are the raw payload
  * bytes. A real deployment decodes PCM and feeds those samples here;
  * everything downstream — framing, the cross-multiplied energy
  * comparison, the hamming-banded candidate join — is the production
  * algorithm unchanged.
  *
  * The payload is split into 65 near-equal frames by per-byte
  * assignment `frame(i) = (i * 65) / len` (integer division — trivially
  * replayable cross-engine, no boundary arithmetic); bit k (0..63) is
  * set iff frame k+1 has higher MEAN energy than frame k, compared as
  * the exact cross-multiplication `e(k+1)*n(k) > e(k)*n(k+1)` (frames
  * may differ by one byte in size; float means would round). Adding any
  * constant to every sample cancels in that inequality, so the
  * fingerprint is exactly invariant to DC offset/uniform gain shifts —
  * the property that makes it a CONTENT signal rather than a byte hash.
  *
  * Payloads shorter than 65 bytes yield null (a frame would be empty) —
  * the header parsers' garbage-tolerance contract: corrupt stubs must
  * not manufacture near-dup pairs.
  */
object AudioFingerprintKernel {

  val F = 65 // energy frames -> 64 gradient bits

  val Schema: StructType = StructType(Seq(
    StructField("audio_fp", LongType, nullable = true)))

  private val nulls = new GenericInternalRow(Array[Any](null))

  def compute(p: Array[Byte]): InternalRow = {
    if (p.length < F) return nulls
    val e = new Array[Long](F)
    val n = new Array[Long](F)
    val len = p.length.toLong
    var i = 0
    while (i < p.length) {
      val k = ((i.toLong * F) / len).toInt
      e(k) += p(i) & 0xFF
      n(k) += 1
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < F - 1) {
      if (e(k + 1) * n(k) > e(k) * n(k + 1)) fp |= 1L << k
      k += 1
    }
    new GenericInternalRow(Array[Any](fp))
  }
}

/** struct(audio_fp) from a binary payload — one codegen'd call per row
  * into [[AudioFingerprintKernel.compute]]; null field for payloads too
  * short to frame.
  */
case class AudioFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${t.sql}")
  }
  override def dataType: DataType = AudioFingerprintKernel.Schema
  override def prettyName: String = "audio_fingerprint"

  override def nullSafeEval(p: Any): Any =
    AudioFingerprintKernel.compute(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioFingerprintKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFingerprintFunctions {
  def audioFingerprint(payload: Column): Column =
    Bridge.column(AudioFingerprint(Bridge.expression(payload)))
}
