package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the float-vector dot product.
  *
  * The `aggregate(zip_with(...))` higher-order-function formulation is
  * interpreted (no whole-stage codegen) and allocates a zipped array per
  * row; on the all-pairs cosine path that made HOF evaluation ~90% of
  * query time at sf0.1. This expression generates a tight primitive
  * loop — no allocation, stays inside WholeStageCodegen — and keeps the
  * exact same sequential fold order, so results are bit-identical to the
  * HOF version and to the DuckDB oracle's left-to-right sum.
  *
  * Null semantics: null if either side is null (BinaryExpression default);
  * null ELEMENTS are treated as 0 contribution to match
  * `zip_with`+`aggregate` (whose lambda would yield null poisoning — the
  * corpus has no null elements; both paths agree on real data).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_float expects two array<float> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two instances of this expression can land in the same
      // (unbraced) codegen scope; fixed identifiers would collide and
      // silently fall back to interpreted execution
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two array<long> vectors, in LONG
  * arithmetic — the distance kernel of the integer-exact k-means
  * ([[graft.operators.Cluster]]). Integer adds are associative, so the
  * result is bit-identical across engines, partitionings, and fold
  * orders — unlike any float distance. Same codegen rationale as
  * [[DotProductFloat]]: a tight primitive loop inside WholeStageCodegen
  * instead of an interpreted zip_with/aggregate HOF pair.
  *
  * Null semantics: null if either array is null; null ELEMENTS
  * contribute 0 (the quantized corpus has none).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist_long expects two array<bigint> args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sq_dist_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass static kernels the codegen'd expressions call — the
  * [[graft.functions.GramHashes]] pattern: a single static invocation
  * stays inside WholeStageCodegen without hand-writing array-builder
  * codegen.
  */
object VectorKernels {
  /** All `tables` band buckets of a float vector in one pass over a flat
    * (tables·bits·dim) plane matrix: bucket[t] gets bit j iff
    * dot(v, plane[t·bits+j]) > 0. Arithmetic is element-for-element the
    * [[DotProductFloat]] fold (double accumulation, left-to-right, null
    * elements contribute 0), so buckets are bit-identical to the
    * per-plane expression formulation and to the DuckDB oracle.
    */
  def bandBuckets(a: ArrayData, planes: Array[Float], tables: Int,
      bits: Int): ArrayData = {
    val dim = planes.length / (tables * bits)
    val n = math.min(a.numElements(), dim)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i)) {
            s += a.getFloat(i).toDouble * planes(base + i).toDouble
          }
          i += 1
        }
        if (s > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Index of the nearest centroid (squared-L2 in LONG arithmetic, the
    * [[SqDistLong]] kernel element-for-element) over a flat (k·dim)
    * centroid matrix, plus that distance. Strict `<` while scanning
    * ascending ids keeps the FIRST minimum, so ties break to the lowest
    * centroid id — identical to the `least()`-of-structs argmin's
    * lexicographic (dist, cluster) order. Returns `{dist, cluster}` as
    * an InternalRow matching NearestCentroidLong's struct type.
    */
  def nearestCentroid(a: ArrayData, cents: Array[Long], ids: Array[Int],
      dim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = math.min(a.numElements(), dim)
    val k = ids.length
    var bestDist = Long.MaxValue
    var best = 0
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val d = a.getLong(i) - cents(base + i)
          s += d * d
        }
        i += 1
      }
      if (s < bestDist) { bestDist = s; best = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestDist, ids(best)))
  }

  /** `floor(x * scale)` per element, float → long — the k-means
    * quantization step as one pass. Element-for-element the
    * `transform(v, x -> floor(cast(x as double) * scale))` HOF (double
    * multiply, floor, null elements stay null), so quantized vectors
    * are bit-identical to the HOF form and the DuckDB list_transform
    * oracle.
    */
  def quantizeFloor(a: ArrayData, scale: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) null
        else math.floor(a.getFloat(i).toDouble * scale).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Unit-L2 copy of a float vector. Norm accumulates left-to-right in
    * double (the [[DotProductFloat]] fold order) and each element is
    * DIVIDED by it — not multiplied by a reciprocal, which rounds
    * differently and would break the cross-engine oracle. A zero (or
    * all-null) vector is returned unchanged — the standard guard; null
    * elements contribute nothing and stay null.
    */
  def l2normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getFloat(i).toDouble
        s += x * x
      }
      i += 1
    }
    if (s == 0.0) return a.copy()
    val nrm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) null
        else (a.getFloat(i).toDouble / nrm).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** All band-LSH buckets of a float vector as one array<long> — the
  * code-size-safe form of the banded hash at AUTO-SIZED code lengths.
  * The per-plane formulation (sum of `when(dot > 0, 1<<j)` over one
  * [[DotProductFloat]] per plane) builds tables·bits separate expression
  * trees: generated code grows linearly with the code length, and at
  * b ~ log2(n) (5×19 = 95 plane trees at a 200k corpus, ~31 bits at
  * 10^9) the projection bloats, JIT quality degrades, and a whole-stage
  * method can overflow into interpreted fallback. This expression is ONE
  * kernel call whatever (tables, bits): the vector loads once, the flat
  * plane matrix rides the codegen references array, code size is
  * constant. Bucket values are bit-identical to the per-plane form
  * (same fold order — spec-pinned), so every oracle stays valid.
  *
  * The plane matrix is the same fixed seeded-LCG Rademacher stream as
  * `SimilaritySearch.hyperplanes` (regenerated here: a prefix of the
  * same deterministic stream, so row t·bits+j is the identical plane
  * the per-plane form used).
  */
case class BandBucketsFloat(child: Expression, tables: Int, bitsPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(tables >= 1 && bitsPerTable >= 1 && bitsPerTable <= 62,
    s"band shape out of range: ${tables}x$bitsPerTable")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_buckets_float expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets_float"

  /** Vector dimensionality of the corpus family (SimilaritySearch.Dim). */
  private val Dim = 64

  // the SimilaritySearch.hyperplanes MMIX-LCG stream, flattened: row
  // t*bits+j is plane j of table t — identical to what lshBandBucket
  // indexes out of its own prefix of the same stream
  @transient private lazy val planesFlat: Array[Float] = {
    var state = 0x5DEECE66DL
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state
    }
    Array.fill(tables * bitsPerTable * Dim)(
      if ((next() >>> 32 & 1) == 1L) 1.0f else -1.0f)
  }

  override def nullSafeEval(a: Any): Any =
    VectorKernels.bandBuckets(a.asInstanceOf[ArrayData], planesFlat,
      tables, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("bandPlanes", planesFlat, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.bandBuckets($c, $planesRef, " +
        s"$tables, $bitsPerTable)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The k-means quantization `floor(x * scale)` as a codegen'd kernel
  * call — the `transform()` higher-order-function form is
  * CodegenFallback, and a CodegenFallback expression anywhere in a
  * projection keeps the WHOLE stage out of whole-stage codegen (the
  * assignment projection collapses quantize + argmin into one Project,
  * so the HOF would drag the argmin kernel down with it). Bit-identical
  * to the HOF form (same double multiply / floor; scale is a power of
  * two so the multiply is IEEE-exact), so the kmeans DuckDB oracles are
  * untouched.
  */
case class QuantizeFloorFloat(child: Expression, scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(scale > 0, s"scale must be positive, got $scale")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_floor_float expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "quantize_floor_float"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.quantizeFloor(a.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.quantizeFloor($c, ${scale}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Centroid matrix carried by [[NearestCentroidLong]] — flat (k·dim)
  * row-major longs plus the cluster id of each row, ids ASCENDING (the
  * kernel's first-minimum scan then reproduces the lexicographic
  * (dist, lowest-id) tie-break). A dedicated holder, not a bare array
  * pair, so the expression's toString/plan dump shows `centroids[k x d]`
  * instead of k·d literals, and equality is by CONTENT (arrays in case
  * classes compare by reference, which would break expression
  * canonicalization and subexpression elimination).
  */
final class CentroidMatrix(val flat: Array[Long], val ids: Array[Int],
    val dim: Int) extends Serializable {
  require(dim > 0 && ids.nonEmpty && flat.length == ids.length * dim,
    s"inconsistent centroid matrix: ${flat.length} longs, " +
      s"${ids.length} ids, dim $dim")
  require(ids.zip(ids.tail).forall { case (a, b) => a <= b },
    "centroid ids must be ascending (tie-break order); duplicates are " +
      "tolerated — the first-minimum scan keeps the smaller distance " +
      "and the earlier row on ties, matching the least()-struct order")
  def k: Int = ids.length
  override def toString: String = s"centroids[${k}x$dim]"
  override def hashCode: Int =
    (java.util.Arrays.hashCode(flat) * 31 +
      java.util.Arrays.hashCode(ids)) * 31 + dim
  override def equals(o: Any): Boolean = o match {
    case c: CentroidMatrix => c.dim == dim &&
      java.util.Arrays.equals(c.ids, ids) &&
      java.util.Arrays.equals(c.flat, flat)
    case _ => false
  }
}

/** The k-means assignment argmin as ONE constant-code-size kernel call —
  * the [[BandBucketsFloat]] lesson applied to clustering: the
  * `least()`-of-k-structs formulation builds k separate [[SqDistLong]]
  * expression trees, so generated code grows linearly with k and past a
  * few dozen centroids the projection bloats out of JIT quality
  * (measured: k=80 assignment 12.7 s via literals, 0.5 s via this
  * kernel at 20k vectors). Here the centroid matrix rides the codegen
  * references array as DATA and the loop is the code: constant code
  * size at any k, still map-only, still inside WholeStageCodegen.
  * Arithmetic and tie-break are element-for-element the literal form
  * (spec-pinned bit-identical), so every oracle stays valid.
  *
  * Returns `struct(dist bigint, cluster int)` — the same shape the
  * literal argmin produced, consumed as `m.dist` / `m.cluster`.
  */
case class NearestCentroidLong(child: Expression, cents: CentroidMatrix)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_long expects array<bigint>, got ${t.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dist", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cluster",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "nearest_centroid_long"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCentroid(a.asInstanceOf[ArrayData], cents.flat,
      cents.ids, cents.dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", cents.flat, "long[]")
    val idsRef = ctx.addReferenceObj("centIds", cents.ids, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCentroid($c, $flatRef, " +
        s"$idsRef, ${cents.dim})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unit-L2 normalization of an array<float> column — the embedding-prep
  * step every cosine-based pipeline runs first (after which cosine ==
  * dot product and the norm join columns disappear). One codegen'd call
  * per row into [[VectorKernels.l2normalize]]; map-only plans.
  */
case class L2NormalizeFloat(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize_float expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "l2_normalize_float"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.l2normalize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.l2normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd float-array dot product in double precision. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductFloat(Bridge.expression(a), Bridge.expression(b)))
  /** Codegen'd long-array squared L2 distance (integer-exact). */
  def sqDistL(a: Column, b: Column): Column =
    Bridge.column(SqDistLong(Bridge.expression(a), Bridge.expression(b)))
  /** Codegen'd unit-L2 float vector normalization. */
  def l2normF(a: Column): Column =
    Bridge.column(L2NormalizeFloat(Bridge.expression(a)))
  /** All banded-LSH buckets in one constant-code-size kernel call. */
  def bandBucketsF(a: Column, tables: Int, bitsPerTable: Int): Column =
    Bridge.column(BandBucketsFloat(Bridge.expression(a), tables, bitsPerTable))
  /** Nearest-centroid argmin (`struct(dist, cluster)`) in one
    * constant-code-size kernel call; `centroids` must carry ascending
    * ids (see [[CentroidMatrix]]).
    */
  def nearestCentroidL(qv: Column, centroids: CentroidMatrix): Column =
    Bridge.column(NearestCentroidLong(Bridge.expression(qv), centroids))
  /** Codegen'd `floor(x * scale)` float→long quantization. */
  def quantizeFloorF(a: Column, scale: Long): Column =
    Bridge.column(QuantizeFloorFloat(Bridge.expression(a), scale))
}
