package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native float-vector kernels for the ANN hot path. The declarative
  * equivalents (aggregate ∘ zip_with) are CodegenFallback in Spark — every
  * element bounces through boxed lambda evaluation. These expressions emit
  * a tight primitive loop under whole-stage codegen while producing
  * **bit-identical** results to the sequential-fold definition (same
  * per-element f32→f64 widening, same left-to-right accumulation), so the
  * DuckDB oracles and the fold-based implementations agree exactly.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // NULL exactly when the fold form is NULL: null input array, length
  // mismatch (zip_with pads with nulls → null product poisons the sum), or
  // any null element — so RewriteDotProduct is semantics-preserving on
  // every input, not just well-formed ones.
  override def nullable: Boolean = true

  // ARRAY<FLOAT> only: ArrayData.getFloat on an ARRAY<DOUBLE> would read 4
  // of each element's 8 bytes and produce silent garbage similarities (the
  // same hazard HyperplaneBucketsExpr guards against)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    DotProduct.dotOrNull(a, b)
  }

  // allocation-free hot path: well-formedness is a primitive boolean check
  // and the sum a primitive loop — no Double boxing per row in the ANN/PQ
  // distance kernels this expression exists to speed up
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.DotProduct.wellFormed($a, $b)) {
         |  ${ev.value} = graft.functions.DotProduct.dot($a, $b);
         |} else { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Sequential left-fold in double over float elements — the exact
    * accumulation order of `aggregate(zip_with(a,b,*), 0d, +)` and of the
    * DuckDB `list_reduce` oracle. Precondition: equal lengths, no null
    * elements (see [[dotOrNull]] for the total version). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** The fold's null precondition as a primitive check: equal lengths, no
    * null elements. Generated code branches on this and calls [[dot]] —
    * allocation-free. */
  def wellFormed(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Total version matching the fold's null semantics exactly: null on
    * length mismatch or any null element (interpreted path only). */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double =
    if (wellFormed(a, b)) dot(a, b) else null

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** cosine = dot/(√dot(a,a)·√dot(b,b)) with every factor from the same
    * kernel — matches the fold-based Similarity.cosine bit-for-bit. */
  def cosine_similarity(a: Column, b: Column): Column =
    dot_product(a, b) /
      (org.apache.spark.sql.functions.sqrt(dot_product(a, a)) *
        org.apache.spark.sql.functions.sqrt(dot_product(b, b)))
}

/** Native integer-code dot for the int8-quantized serving path —
  * [[DotProduct]]'s LONG twin: `aggregate(zip_with(codes_a, codes_b,
  * _*_), 0L, _+_)` is CodegenFallback (boxed lambda per element), and
  * the coarse stage of quantized ANN runs it corpus × queries times.
  * Integer addition is associative, but the kernel still runs the same
  * left-to-right order as the fold — exactness is trivial, the win is
  * purely the primitive loop.
  */
case class DotCodes(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_codes"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, LongType => LT}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LT, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    DotCodes.dotOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.DotProduct.wellFormed($a, $b)) {
         |  ${ev.value} = graft.functions.DotCodes.dot($a, $b);
         |} else { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotCodes =
    copy(left = newLeft, right = newRight)
}

object DotCodes {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Long =
    if (DotProduct.wellFormed(a, b)) dot(a, b) else null

  def dot_codes(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotCodes(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
