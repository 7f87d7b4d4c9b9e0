package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selection over a normalized string — bit-identical
  * to the declarative array-HOF form in [[graft.text.Fingerprint]]
  * (40-bit md5-prefix gram hash packed over a descending 20-bit
  * position, window-min with rightmost tie-break, contiguous-dedup)
  * but ONE tight loop with an O(1)-amortized monotonic-deque window
  * minimum, instead of O(grams × w) interpreted lambda evaluations —
  * Spark's higher-order functions (`transform`, `array_min`) never
  * enter whole-stage codegen, so each element pays boxed-closure
  * dispatch that this kernel eliminates.
  *
  * Per-gram hash parity contract: `conv(substring(md5(gram), 1, 10),
  * 16, 10)` == the big-endian value of the digest's first 5 bytes
  * (asserted against the SQL form in FingerprintSpec's brute-force
  * parity, which derives hashes independently).
  *
  * Returns ARRAY<LONG> of the selected packed keys (empty when the
  * input is shorter than k + w − 1). Input longer than the 2^20
  * position field throws — the same loud-failure contract as the
  * declarative form (silent corruption is the alternative).
  */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be positive (got k=$k w=$w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_keys expects STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowKeys.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKeys.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

object WinnowKeys {

  private val PosBits = 20
  private val PosField = 1L << PosBits

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The kernel: gram keys + sliding-window minima + contiguous dedup.
    * Positions are 1-based like the SQL form. */
  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    // normalized text is [a-z0-9]* — pure ASCII, so bytes == chars and
    // byte-slicing the UTF-8 buffer is exact
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    if (n - k + 1 > PosField - 1)
      throw new IllegalArgumentException(
        s"winnow: normalized doc exceeds the ${PosField - 1 + (k - 1)}" +
          "-char packed-position cap — chunk upstream")
    val md = mdLocal.get()
    val g = n - k + 1
    // monotonic deque over packed keys: front = current window minimum.
    // Keys are unique (position field), so strict inequality suffices
    // and the min sequence never oscillates back — contiguous dedup is
    // total dedup.
    val dqKey = new Array[Long](g)
    val dqPos = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * g / (w + 1) + 4)
    var last = Long.MinValue
    var p = 0
    while (p < g) {
      md.reset()
      md.update(bytes, p, k)
      val d = md.digest()
      var h = 0L
      var i = 0
      while (i < 5) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      val key = h * PosField + (PosField - 1 - (p + 1))
      // drop dominated keys from the back (larger key, earlier pos)
      while (tail > head && dqKey(tail - 1) >= key) tail -= 1
      dqKey(tail) = key; dqPos(tail) = p; tail += 1
      // expire keys that left the window [p - w + 1, p]
      while (dqPos(head) < p - w + 1) head += 1
      if (p >= w - 1) { // first full window ends at gram index w-1
        val sel = dqKey(head)
        if (sel != last) { out += sel; last = sel }
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  def winnowKeys(str: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowKeys(ColumnBridge.expression(str), k, w))
}
