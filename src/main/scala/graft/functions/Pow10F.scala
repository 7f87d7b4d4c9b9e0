package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, FloatType, IntegerType}

/** F1 scale factor `10^p` as float32, deterministically.
  *
  * The reference computes the factor with Rust `f32::powf`
  * (lib/personalgreenbutton/src/lib.rs:171-173); platform libms produce the
  * correctly-rounded f32 for integer exponents in the ESPI multiplier
  * domain (|p| ≤ 24). `StrictMath.pow` is fdlibm — identical on every JVM —
  * and its double result cast to float is that same correctly-rounded f32,
  * so this expression is bit-stable across JVMs and matches the reference,
  * where Spark's `pow` (`Math.pow`, JVM-intrinsic) is only
  * tolerance-level reproducible.
  */
case class Pow10F(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pow10f expects an INT exponent, got ${child.dataType.catalogString}")
  override def dataType: DataType = FloatType
  override def prettyName: String = "pow10f"

  override def nullSafeEval(p: Any): Any =
    Pow10F.pow10(p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.Pow10F.pow10($p)")

  override protected def withNewChildInternal(newChild: Expression): Pow10F =
    copy(child = newChild)
}

object Pow10F {
  def pow10(p: Int): Float = StrictMath.pow(10.0, p.toDouble).toFloat

  def pow10f(p: Column): Column =
    ColumnBridge.column(Pow10F(ColumnBridge.expression(p)))
}
