package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Structured orthogonal rotation for quantization preprocessing — the
  * OPQ-lite / FALCONN construction `x → H·D·x / √d`: a deterministic
  * ±1 sign diagonal `D` (md5 parity per component — no trained state to
  * ship) followed by the fast Walsh–Hadamard transform, normalized by
  * √d (a power of two, so the scale is EXACT in floating point). The
  * composition is orthogonal, so dot products and L2 distances are
  * mathematically preserved while energy spreads evenly across
  * components — which is what product quantizers want: per-subspace
  * codebooks stop seeing wildly uneven variance
  * (Ge et al., "Optimized Product Quantization", CVPR 2013 motivates
  * the rotation; the structured H·D form is the classic cheap stand-in
  * for the trained rotation).
  *
  * Arithmetic contract: input f32 widens to f64, sign flips are exact,
  * the butterfly adds run in a FIXED order (stage h = 1,2,4,…; pairs
  * (i, i+h) ascending), and the final ×(1/√d) is exact — then ONE
  * IEEE round-to-nearest back to f32 per component. Deterministic
  * everywhere; an independent implementation following this order
  * reproduces it bit-for-bit ([[FwhtRotateExpr.rotateRef]] is that
  * reference, asserted in spec).
  *
  * `dim` must be a power of two; inputs of any other width fail LOUDLY
  * (a silent pad would shift every downstream code).
  */
case class FwhtRotateExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2 && (dim & (dim - 1)) == 0,
    s"fwht_rotate: dim=$dim must be a power of two >= 2")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "fwht_rotate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT>, got ${other.catalogString}")
    }

  @transient private lazy val signs: Array[Byte] =
    FwhtRotateExpr.signVector(dim)

  override def nullSafeEval(input: Any): Any =
    FwhtRotateExpr.rotate(input.asInstanceOf[ArrayData], signs, dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("fwhtSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FwhtRotateExpr.rotate($c, $signsRef, $dim);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FwhtRotateExpr = copy(child = newChild)
}

object FwhtRotateExpr {

  /** sign_j = +1 iff the first 4 md5 hex digits of "fwht_j" are odd —
    * the [[graft.similarity.PortableSim.planeSign]] derivation family:
    * deterministic, engine-independent, no trained state. */
  def signVector(dim: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      val hex = md.digest(s"fwht_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.reset()
      if (java.lang.Long.parseLong(hex.take(4), 16) % 2 == 1) 1: Byte
      else -1: Byte
    }
  }

  def rotate(a: ArrayData, signs: Array[Byte], dim: Int): ArrayData = {
    val n = a.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"fwht_rotate: input width $n != dim $dim (a silent pad would " +
          "shift every downstream quantization code)")
    val buf = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"fwht_rotate: null component at $i")
      buf(i) = a.getFloat(i).toDouble * signs(i)
      i += 1
    }
    var h = 1
    while (h < dim) {
      var start = 0
      while (start < dim) {
        var j = start
        val end = start + h
        while (j < end) {
          val x = buf(j)
          val y = buf(j + h)
          buf(j) = x + y
          buf(j + h) = x - y
          j += 1
        }
        start += h * 2
      }
      h *= 2
    }
    val scale = 1.0 / math.sqrt(dim.toDouble) // power-of-two dim: exact
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) {
      out(i) = (buf(i) * scale).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Independent reference (plain Scala, no ArrayData) for spec parity. */
  private[graft] def rotateRef(xs: Array[Float], dim: Int): Array[Float] = {
    val signs = signVector(dim)
    val buf = xs.indices.map(i => xs(i).toDouble * signs(i)).toArray
    var h = 1
    while (h < dim) {
      for (start <- 0 until dim by h * 2; j <- start until start + h) {
        val x = buf(j); val y = buf(j + h)
        buf(j) = x + y; buf(j + h) = x - y
      }
      h *= 2
    }
    buf.map(v => (v / math.sqrt(dim.toDouble)).toFloat)
  }

  def fwht_rotate(c: Column, dim: Int): Column =
    ColumnBridge.column(FwhtRotateExpr(ColumnBridge.expression(c), dim))
}
