package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise SUM of double arrays — the vector-accumulator aggregate
  * Spark lacks natively (the stock answer is posexplode → groupBy(pos),
  * which ships one shuffle row PER ELEMENT PER INPUT ROW: for a d²-wide
  * covariance accumulation over n vectors that is n·d² shuffle rows).
  * This is a [[TypedImperativeAggregate]] like [[BottomKByHash]]: each
  * map task folds its rows into ONE d-width double buffer, the shuffle
  * carries one buffer per (group × map task), and merge is element-wise
  * add — the classic distributed-gradient/covariance reduction shape
  * ([[graft.similarity.Opq.procrustesStep]]'s M = Σ x·ŷᵀ is the
  * in-repo consumer).
  *
  * Width is learned from the first non-null non-empty row; a
  * width-mismatched row FAILS LOUD (a silent truncating zip would
  * corrupt every statistic downstream). Null rows AND width-0 rows are
  * skipped — treating empties as mismatches would make acceptance
  * depend on partition row order; a group with no contributing rows
  * evaluates to an empty array. Addition order follows Spark's
  * partition/merge order — like every distributed double `sum`, the
  * result is deterministic only up to FP reassociation; exactness-
  * sensitive consumers quantize first (the repo's integer-lattice
  * convention).
  *
  * SQL form (via [[graft.GraftExtensions]]): `array_sum_agg(arr)`.
  * DuckDB oracle twin: `list_transform(range(1, d+1), i ->
  * sum(arr[i]))` or the unnest/groupBy-pos replay.
  */
case class ArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "array_sum_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sum_agg requires ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  /** Empty = uninitialized (width unknown until the first row). */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // width-0 rows skip like nulls IN EITHER POSITION — without this,
      // [[], [1,2]] would be absorbed while [[1,2], []] threw a width
      // mismatch, making acceptance depend on partition row order
      if (n == 0) buf
      else if (buf.isEmpty) {
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          require(!arr.isNullAt(i),
            "array_sum_agg: null element in input array")
          out(i) = arr.getDouble(i); i += 1
        }
        out
      } else {
        require(n == buf.length,
          s"array_sum_agg: row width $n != accumulator width ${buf.length}")
        var i = 0
        while (i < n) {
          require(!arr.isNullAt(i),
            "array_sum_agg: null element in input array")
          buf(i) += arr.getDouble(i); i += 1
        }
        buf
      }
    }
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      require(buf.length == other.length,
        s"array_sum_agg: merging widths ${buf.length} != ${other.length}")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(d => d: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArraySumAgg =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  /** Column wrapper: element-wise sum of ARRAY<DOUBLE> per group. */
  def array_sum_agg(arr: Column): Column =
    ColumnBridge.column(
      ArraySumAgg(ColumnBridge.expression(arr)).toAggregateExpression())
}
