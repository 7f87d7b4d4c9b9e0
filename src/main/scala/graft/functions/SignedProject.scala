package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native signed-random-projection kernel — the codegen'd form of
  * [[graft.similarity.RandomProjection]]'s per-row work. The declarative
  * fold (`aggregate(zip_with(quantized, signs, _*_), 0L, _+_)` once per
  * OUTPUT dim) is CodegenFallback: every element pays boxed-closure
  * dispatch, and the whole quantization subtree re-evaluates once per
  * output component (the minhashSignatureFold lesson — HOF inputs
  * evaluate per row, lambda bodies per element, but a repeated
  * aggregate's INPUT repeats per aggregate). This kernel quantizes each
  * input component ONCE (`round(x·1e6)` with Spark's exact
  * BigDecimal/HALF_UP semantics, so results are bit-identical to the
  * fold and to the DuckDB oracle) and then runs `dimOut` primitive
  * sign-sum loops.
  *
  * Contract (checked, not padded): input must be ARRAY<FLOAT> of length
  * `dimIn` with no null elements — anything else yields NULL, loudly
  * absent rather than silently wrong. The ±1 sign matrix is md5-parity
  * of `"rp:i:j"` ([[graft.similarity.RandomProjection.sign]] — the one
  * definition both engines implement), materialized once per plan and
  * shipped as a reference object, never recomputed per row.
  */
case class SignedProjectExpr(child: Expression, dimIn: Int, dimOut: Int)
    extends UnaryExpression {
  // validated HERE (not only in the Column API wrapper) so the SQL
  // registration path gets the same loud error instead of a
  // NegativeArraySizeException from signMatrix — and the product bound
  // keeps dimIn*dimOut inside Int (65536*65536 would overflow to 0 and
  // silently return empty projections)
  require(dimIn >= 1 && dimOut >= 1,
    s"signed_project: dimIn=$dimIn and dimOut=$dimOut must be >= 1")
  // budget sized to RandomProjection's contract (a per-plan constant of
  // at most a few MB, built once per executor): 2^20 entries = a 4 MB
  // int array and ≤ ~1M sign() derivations at construction. The old
  // 2^24 budget permitted a 64 MB reference object and ~16.7M
  // MessageDigest instantiations — far past anything the JL lemma asks
  // for (dimOut grows like log n, not past ~1024).
  require(dimIn.toLong * dimOut <= (1 << 20),
    s"signed_project: dimIn*dimOut = ${dimIn.toLong * dimOut} exceeds " +
      s"${1 << 20} (the sign-matrix reference-object budget)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_project"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${other.catalogString}")
    }
  }

  @transient private lazy val signs: Array[Int] =
    SignedProjectExpr.signMatrix(dimIn, dimOut)

  override def nullSafeEval(input: Any): Any =
    SignedProjectExpr.projectOrNull(
      input.asInstanceOf[ArrayData], dimIn, dimOut, signs)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.SignedProjectExpr.projectOrNull(
         |  $a, $dimIn, $dimOut, $signsRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignedProjectExpr = copy(child = newChild)
}

object SignedProjectExpr {

  /** Flattened ±1 matrix, entry (i, j) at `i * dimOut + j`. */
  def signMatrix(dimIn: Int, dimOut: Int): Array[Int] = {
    val out = new Array[Int](dimIn * dimOut)
    var i = 0
    while (i < dimIn) {
      var j = 0
      while (j < dimOut) {
        out(i * dimOut + j) = graft.similarity.RandomProjection.sign(i, j)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Spark `round(d).cast(long)` under ANSI, exactly: BigDecimal.valueOf
    * + HALF_UP + toDouble (NOT `floor(d + 0.5)`, whose double-rounding
    * disagrees at values one ulp below a half), then the ANSI overflow
    * contract — a non-finite or out-of-Long-range component FAILS
    * LOUDLY, matching the declarative fold's CAST_OVERFLOW, instead of
    * Scala's silent `.toLong` saturation. */
  private def sparkRound(d: Double): Long = {
    if (d.isNaN || d.isInfinite)
      throw new ArithmeticException(
        s"signed_project: non-finite component $d cannot quantize to BIGINT")
    val rd = java.math.BigDecimal.valueOf(d)
      .setScale(0, RoundingMode.HALF_UP).doubleValue()
    // castable doubles are exactly [-2^63, 2^63): -2^63 == Long.MinValue
    // is representable, 2^63 already exceeds Long.MaxValue
    if (rd >= 9.223372036854776e18 || rd < -9.223372036854776e18)
      throw new ArithmeticException(
        s"signed_project: component $d overflows BIGINT after quantization")
    rd.toLong
  }

  /** Null on length mismatch or null element; otherwise the exact
    * projected BIGINT components. */
  def projectOrNull(a: ArrayData, dimIn: Int, dimOut: Int,
                    signs: Array[Int]): ArrayData = {
    if (a.numElements() != dimIn) return null
    val q = new Array[Long](dimIn)
    var i = 0
    while (i < dimIn) {
      if (a.isNullAt(i)) return null
      q(i) = sparkRound(a.getFloat(i).toDouble * 1000000.0)
      i += 1
    }
    val out = new Array[Long](dimOut)
    var j = 0
    while (j < dimOut) {
      var s = 0L
      var k = 0
      while (k < dimIn) {
        s += q(k) * signs(k * dimOut + j)
        k += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  def signed_project(emb: Column, dimIn: Int, dimOut: Int): Column =
    ColumnBridge.column(
      SignedProjectExpr(ColumnBridge.expression(emb), dimIn, dimOut))
}
