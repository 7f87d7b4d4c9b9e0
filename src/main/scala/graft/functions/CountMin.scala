package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Frequent-items sketch probe: estimate a key's count from a serialized
  * `count_min_sketch(...)` aggregate. Spark ships the CMS *builder* as a
  * SQL aggregate but no probe expression — this is the missing read side,
  * shaped like Spark's own `BloomFilterMightContain`: the sketch arrives as
  * a foldable input (scalar subquery), deserializes ONCE per task, and the
  * per-row probe is a handful of array reads. CMS counters are sums, so
  * merge order can't change results — estimates are deterministic for a
  * fixed seed, and never UNDER-estimate.
  *
  * The 100 TB pattern: sketch the corpus in one pass (mergeable partials),
  * probe candidate keys without a per-key groupBy — heavy-hitter monitoring
  * at a fixed memory budget.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: sketch argument must be BINARY (a serialized " +
          s"count_min_sketch), got ${left.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  // the serialized sketch is constant for the query (literal or scalar
  // subquery result) — deserialize once per task, not per row
  @transient private lazy val sketch: CountMinSketch = {
    val bytes =
      try left.eval(null).asInstanceOf[Array[Byte]]
      catch {
        case e: NullPointerException =>
          // a per-row column reached eval(null) — name the contract
          // instead of surfacing a bare NPE from deep inside codegen
          throw new IllegalStateException(
            s"$prettyName: the sketch argument must be query-constant " +
              "(a literal or scalar subquery), not a per-row column", e)
      }
    if (bytes == null) null
    else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Null-sketch check for generated code (keeps codegen behavior equal to
    * the interpreted eval: NULL sketch → NULL estimate, never an NPE). */
  def sketchExists: Boolean = sketch != null

  /** Probe entry also used from generated code. */
  def estimate(item: Any): Long = {
    val key = item match {
      case s: UTF8String => s.toString
      case other => other
    }
    sketch.estimateCount(key)
  }

  override def eval(input: InternalRow): Any = {
    if (sketch == null) return null
    val v = right.eval(input)
    if (v == null) null else estimate(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimate].getName)
    val rightCode = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${rightCode.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${rightCode.isNull} && $self.sketchExists()) {
          ${ev.isNull} = false;
          ${ev.value} = $self.estimate(${rightCode.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  /** Column wrapper: estimated count of `key` in serialized sketch `cms`. */
  def cms_estimate(cms: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(cms), ColumnBridge.expression(key)))
}
