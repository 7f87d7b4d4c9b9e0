package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native kernels for the binary-quantization coarse stage
  * ([[graft.similarity.BinaryQuantize]]) — the repo's standard move for
  * per-row hot loops: the declarative fold forms
  * (`signBitsFold`/`hammingWordsFold`) are array HOFs and therefore
  * CodegenFallback (boxed lambda dispatch per element), which is the
  * wrong shape for the one stage that scans the ENTIRE corpus per query
  * batch. Each kernel is one tight primitive loop, bit-identical to its
  * fold (asserted in BinaryQuantizeSpec), with the folds kept as the
  * executable reference semantics.
  */
/** Packed sign bits: word w bit j set iff element `32w + j` > 0f.
  * Degenerate inputs follow the fold's algebra exactly: null elements
  * and positions past the array clear their bit (zip_with pads with
  * null; `when(null > 0)` falls to 0); elements beyond `dim` but inside
  * the last word's 32-slot window still contribute (the fold's slice
  * covers whole words). */
case class SignBitsExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"sign_bits: dim=$dim must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SignBitsExpr.pack(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBitsExpr.pack($c, $dim);")

  override protected def withNewChildInternal(
      newChild: Expression): SignBitsExpr = copy(child = newChild)
}

object SignBitsExpr {
  def pack(a: ArrayData, dim: Int): ArrayData = {
    val nWords = (dim + 31) / 32
    val out = new Array[Long](nWords)
    val n = math.min(a.numElements(), nWords * 32)
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j) && a.getFloat(j) > 0f)
        out(j >> 5) |= 1L << (j & 31)
      j += 1
    }
    new GenericArrayData(out)
  }

  def sign_bits(c: Column, dim: Int): Column =
    ColumnBridge.column(SignBitsExpr(ColumnBridge.expression(c), dim))
}

/** Hamming distance over packed-word arrays: Σ bitCount(a_w ^ b_w).
  * NULL on length mismatch or any null element — the fold's null
  * algebra (zip_with pads, xor/bit_count/+ propagate null). */
case class HammingWordsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_words"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HammingWordsExpr.hammingOrNull(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.functions.DotProduct.wellFormed($a, $b)) {
         |  ${ev.value} = graft.functions.HammingWordsExpr.hamming($a, $b);
         |} else { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingWordsExpr =
    copy(left = newLeft, right = newRight)
}

object HammingWordsExpr {
  def hamming(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  def hammingOrNull(a: ArrayData, b: ArrayData): java.lang.Long =
    if (DotProduct.wellFormed(a, b)) hamming(a, b) else null

  def hamming_words(a: Column, b: Column): Column =
    ColumnBridge.column(HammingWordsExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
