package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (SURVEY.md extension ops):
  *
  *   h_0 = 0;  h_i = (h_{i-1} * 31 + codepoint_i) mod 1_000_000_007
  *
  * A native Catalyst `Expression` with `doGenCode` so it stays inside
  * whole-stage codegen (no UDF serialization, no boxing in the hot path —
  * the preference order of SURVEY §7.3 / the build brief). The mod-prime
  * keeps the accumulator in 63 bits, which also makes the definition
  * portable to SQL oracles (DuckDB `list_reduce` over codepoints).
  *
  * Iterates unicode codepoints (not UTF-8 bytes or UTF-16 chars) so the
  * definition is encoding-agnostic.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column API. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
