package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native content-defined-chunking boundary detection — bit-identical
  * to the declarative HOF form in [[graft.text.CdcChunk]] (`filter`
  * over grams of `conv(substring(md5(concat_ws(' ', slice(...))), 1,
  * 4), 16, 10) % modulus = 0`) but one loop with incremental digest
  * updates per token instead of per-gram interpreted slice + concat +
  * Column machinery — Spark HOFs never enter whole-stage codegen (the
  * [[WinnowKeys]] rationale; that kernel measured 15× on the same
  * shape).
  *
  * Parity contract: the 16-bit value is the digest's first two bytes
  * big-endian == the first 4 md5 hex digits; the hashed bytes are the
  * UTF-8 of the w tokens joined by a single space, null elements
  * skipped exactly like `concat_ws`. Returns ARRAY<INT> of 1-based
  * boundary positions j (w ≤ j ≤ n−1); inputs with fewer than w+1
  * tokens have no interior gram end and return empty.
  */
case class CdcBoundaries(child: Expression, w: Int, modulus: Int)
    extends UnaryExpression {
  require(w >= 1 && modulus >= 1,
    s"w and modulus must be positive (got w=$w modulus=$modulus)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries expects ARRAY<STRING> tokens, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[ArrayData], w, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundaries.boundaries($c, $w, $modulus);")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val Space = Array(' '.toByte)

  def boundaries(tokens: ArrayData, w: Int, modulus: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w + 1) return new GenericArrayData(Array.empty[Int])
    // token bytes once; null elements become null entries and are
    // SKIPPED in joins, matching concat_ws semantics
    val tok = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      tok(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val md = mdLocal.get()
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / modulus + 4)
    // gram ENDS at 1-based j, w ≤ j ≤ n-1; 0-based token range
    // [j - w, j - 1]
    var j = w
    while (j <= n - 1) {
      md.reset()
      var t = j - w
      var first = true
      while (t <= j - 1) {
        if (tok(t) != null) {
          if (!first) md.update(Space)
          md.update(tok(t))
          first = false
        }
        t += 1
      }
      val d = md.digest()
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      if (h16 % modulus == 0) out += j
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  def cdcBoundaries(tokens: Column, w: Int, modulus: Int): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(tokens), w, modulus))
}
