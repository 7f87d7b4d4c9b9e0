package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) bit-interleave of two 16-bit keys — the multi-dim
  * data-layout clustering key (Delta/Iceberg `OPTIMIZE ZORDER BY` style):
  * writing files sorted by this key co-locates rows that are close in BOTH
  * dimensions, so parquet min/max footer stats prune files for predicates
  * on either column, not just the leading sort key.
  *
  * Composed from codegen'd built-ins (shift/and/or) via the classic mask
  * ladder — stays inside whole-stage codegen; no UDF, no custom Expression
  * needed. At 100 TB this is a write-path op: `df.repartitionByRange(N,
  * zkey).sortWithinPartitions(zkey).write...` gives both file-level and
  * row-group-level skipping on the interleaved dimensions.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…,30). */
  private def spread16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 32-bit Morton key: bit i of `x` at position 2i, bit i of `y` at 2i+1.
    * Inputs are taken mod 2^16 (callers hash/scale wider domains first).
    */
  def zorderKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Catalyst-expression twin of [[zorderKey]] for the SQL function
    * registry (a builder must return a plain Expression tree — a composed
    * Column's ColumnNode wrapper never converts on that path). Equality
    * with the Column form is pinned in GraftExtensionsSpec. */
  def zorderKeyExpr(x: org.apache.spark.sql.catalyst.expressions.Expression,
                    y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr,
      Cast, Expression, Literal, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    def spread(e: Expression): Expression = {
      var v: Expression = BitwiseAnd(Cast(e, LongType), Literal(0xFFFFL))
      def step(shift: Int, mask: Long): Unit =
        v = BitwiseAnd(BitwiseOr(v, ShiftLeft(v, Literal(shift))),
          Literal(mask))
      step(8, 0x00FF00FFL); step(4, 0x0F0F0F0FL)
      step(2, 0x33333333L); step(1, 0x55555555L)
      v
    }
    BitwiseOr(spread(x), ShiftLeft(spread(y), Literal(1)))
  }
}
