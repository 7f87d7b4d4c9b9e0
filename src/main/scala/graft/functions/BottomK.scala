package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bottom-k-by-hash sample — a custom partial-aggregable
  * Catalyst AGGREGATE (`TypedImperativeAggregate`), the extension point the
  * repo's scalar kernels don't cover: map-side partial buffers, executor
  * merge, binary buffer serialization through the shuffle.
  *
  * Semantics: per group, the k values with the SMALLEST md5(salt ∥ value)
  * digests, emitted in (digest, value) order — a uniform-without-
  * replacement sample that is a pure function of the data (no RNG, no
  * partitioning dependence), so re-runs, engines, and retried tasks agree
  * bit-for-bit. This is the KMV/bottom-k sketch construction: two
  * samples MERGE by keeping the k smallest of the union, which is exactly
  * what makes it partial-aggregable — Spark's own `sampleBy`/`TABLESAMPLE`
  * give approximate fractions, not an exact deterministic k per group, and
  * the `collect_list` + sort alternative buffers whole groups.
  *
  * At 100 TB: each task's buffer is O(k); the shuffle carries one k-entry
  * buffer per (group × map task), never the group's rows. The salt picks
  * the sample; k caps memory. SQL form (registered via
  * [[graft.GraftExtensions]]): `bottomk_by_hash(value, k, salt)`.
  * DuckDB twin (the oracle contract):
  * `(list(v ORDER BY md5(salt || v), v))[1:k]`.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    salt: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(String, String)]] {

  require(k > 0, s"bottomk_by_hash: k must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottomk_by_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_by_hash requires a STRING value column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.ArrayBuffer[(String, String)] =
    mutable.ArrayBuffer.empty

  // MessageDigest is stateful but digest() resets it; one instance per
  // thread avoids a per-row allocation on the hot path
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  private def digest(v: String): String =
    mdLocal.get().digest((salt + v).getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Sort-and-trim to k entries (merge/overflow path). */
  private def trim(buf: mutable.ArrayBuffer[(String, String)])
      : mutable.ArrayBuffer[(String, String)] = {
    if (buf.length > k) {
      val kept = buf.sorted.take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  private val ord = Ordering[(String, String)]

  // the update path keeps the buffer SORTED (merge re-sorts via trim), so
  // the full-buffer hot path rejects with ONE comparison against the last
  // element; an accepted row pays the O(k) insert, which happens a
  // harmonic-series number of times — O(n + k·log k·H_k) total, vs the
  // per-row sort the review flagged
  private def insertSorted(buf: mutable.ArrayBuffer[(String, String)],
                           entry: (String, String)): Unit = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(buf(mid), entry)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, entry)
  }

  override def update(buf: mutable.ArrayBuffer[(String, String)],
                      input: InternalRow): mutable.ArrayBuffer[(String, String)] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = v.asInstanceOf[UTF8String].toString
      val entry = (digest(s), s)
      if (buf.length >= k && !ord.lt(entry, buf(buf.length - 1))) buf
      else {
        insertSorted(buf, entry)
        if (buf.length > k) buf.remove(buf.length - 1)
        buf
      }
    }
  }

  override def merge(buf: mutable.ArrayBuffer[(String, String)],
                     other: mutable.ArrayBuffer[(String, String)])
      : mutable.ArrayBuffer[(String, String)] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: mutable.ArrayBuffer[(String, String)]): Any =
    new GenericArrayData(
      buf.sorted.take(k).map(p => UTF8String.fromString(p._2)).toArray[Any])

  // length-prefixed UTF-8, not writeUTF: sampled VALUES are arbitrary
  // strings and writeUTF hard-fails past 64 KiB
  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }
  private def readStr(in: DataInputStream): String = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    new String(b, StandardCharsets.UTF_8)
  }

  override def serialize(buf: mutable.ArrayBuffer[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (h, v) => writeStr(out, h); writeStr(out, v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < n) { buf += ((readStr(in), readStr(in))); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(child = newChildren.head)
}

object BottomK {
  /** Column wrapper: deterministic k-sample of `value` (string) per group. */
  def bottomKByHash(value: Column, k: Int, salt: String): Column =
    ColumnBridge.column(
      BottomKByHash(ColumnBridge.expression(value), k, salt)
        .toAggregateExpression())
}
