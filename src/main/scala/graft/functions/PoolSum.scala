package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Quantized SUM-pool of a token bag as ONE native aggregate — the
  * 100 TB upgrade of [[graft.similarity.LateInteraction.poolSum]]'s
  * (id, dim) explode shape that SCALE.md names: the declarative form
  * ships ONE SHUFFLE ROW PER (token × dimension) — |corpus tokens|·dims
  * rows through the first exchange — where this
  * [[TypedImperativeAggregate]] (the [[BottomKByHash]] /
  * [[VectorSumAgg]] extension point) folds each map task's tokens into
  * one (dims+1)-slot Long buffer and ships ONE buffer per (doc × map
  * task). Merge is slotwise add; Long addition is associative-exact, so
  * the result is bit-identical to the explode form REGARDLESS of
  * partitioning (spec-pinned) — the reason poolSum quantizes before
  * summing in the first place.
  *
  * Per-component quantization mirrors the declarative
  * `round(x.cast(double) · 1e6).cast(long)` EXACTLY: f32 → f64 widen,
  * one double multiply, Spark's BigDecimal/HALF_UP round (the
  * [[SignedProjectExpr]] lesson — `floor(d+0.5)` double-rounds one ulp
  * below a half), ANSI overflow contract (non-finite or
  * out-of-Long-range fails LOUDLY). Malformed input — width ≠ dims,
  * null array, null element — throws the same loud message as the
  * declarative form's raise_error; a silently short pooled component
  * is the failure mode both exist to prevent.
  *
  * Output: `STRUCT<n_tokens BIGINT, pool ARRAY<BIGINT>>` per group.
  * SQL form (via [[graft.GraftExtensions]]): `pool_sum(embedding, dims)`.
  * DuckDB oracle twin: the unnest/groupBy-position replay the e_pool
  * oracles already use — the aggregate changes the exchange shape, not
  * one output bit.
  */
case class PoolSumAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dims >= 1, s"pool_sum: dims=$dims must be >= 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("pool", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "pool_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pool_sum requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got " +
        other.simpleString)
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Slot 0 = token count; slots 1..dims = component sums. */
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dims + 1)

  /** Spark `round(d).cast(long)` under ANSI, exactly — the
    * [[SignedProjectExpr]] quantizer verbatim. */
  private def sparkRound(d: Double): Long = {
    if (d.isNaN || d.isInfinite)
      throw new ArithmeticException(
        s"pool_sum: non-finite component $d cannot quantize to BIGINT")
    val rd = java.math.BigDecimal.valueOf(d)
      .setScale(0, RoundingMode.HALF_UP).doubleValue()
    if (rd >= 9.223372036854776e18 || rd < -9.223372036854776e18)
      throw new ArithmeticException(
        s"pool_sum: component $d overflows BIGINT after quantization")
    rd.toLong
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // the declarative twin raises on null/short/null-element input — a
    // skipped row would be a silently short pooled component
    if (v == null)
      throw new IllegalArgumentException(
        s"poolSum: embedding width <> $dims or null element")
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dims)
      throw new IllegalArgumentException(
        s"poolSum: embedding width <> $dims or null element")
    var i = 0
    while (i < dims) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"poolSum: embedding width <> $dims or null element")
      val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      buf(i + 1) = Math.addExact(buf(i + 1), sparkRound(d * 1000000.0))
      i += 1
    }
    buf(0) += 1
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) = Math.addExact(buf(i), other(i)); i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericInternalRow(Array[Any](buf(0),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, dims + 1))))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dims + 1)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PoolSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PoolSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PoolSumAgg =
    copy(child = newChildren.head)
}

object PoolSum {
  /** Column wrapper: quantized sum-pool of a token-bag group —
    * `STRUCT<n_tokens, pool>`. */
  def pool_sum(emb: Column, dims: Int): Column =
    ColumnBridge.column(
      PoolSumAgg(ColumnBridge.expression(emb), dims).toAggregateExpression())
}
