package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native multi-table random-hyperplane LSH bucket ids — bit-identical to
  * the declarative `Similarity.hyperplaneBucketsFold` (nested
  * transform/aggregate/zip_with over xxhash64 sign choices) but one fused
  * loop per row instead of O(tables × planes × dim) boxed lambda
  * evaluations with intermediate arrays.
  *
  * Element t of the result is the bucket id in hash table t: `numPlanes`
  * sign bits of the dot products against ±1 hyperplanes (component j of
  * plane (t,p) is +1 iff `xxhash64(t*1000+p, j)` is odd — Spark's XXH64
  * over int inputs, seed 42), tagged with `t * 2^32` so tables never
  * cross-match. The sign matrix is precomputed once at plan time; the
  * per-row work is exactly dim × planes × tables double multiply-adds in
  * declarative fold order (multiplying by ±1.0 is an exact sign flip, and
  * the per-plane sum accumulates j = 0..dim-1 sequentially), so results are
  * bit-identical to the fold form — asserted in SimilaritySpec.
  *
  * Degenerate inputs follow the fold's algebra exactly: an array SHORTER
  * than `dim` or containing a null element makes every plane sum NULL
  * (zip_with pads the embedding side with nulls; null poisons the fold),
  * so all bits are 0 and the bucket is just the table tag. An array LONGER
  * than `dim` pads the index side instead — `xxhash64(seed, null)` skips
  * the null child, so the extra elements contribute with the parity of the
  * plane seed itself; the kernel reproduces that too.
  */
case class HyperplaneBucketsExpr(child: Expression, dim: Int, numPlanes: Int,
                                 numTables: Int) extends UnaryExpression {
  require(numPlanes <= 32, "numPlanes must fit below the table tag bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  // the kernel reads elements with getFloat — reject anything but
  // ARRAY<FLOAT> at analysis time (an ARRAY<DOUBLE> would silently read
  // half of each element's bytes as garbage sign bits)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects ARRAY<FLOAT>, got ${other.catalogString}")
    }

  @transient private lazy val signs: Array[Byte] =
    HyperplaneBucketsExpr.signMatrix(dim, numPlanes, numTables)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucketsExpr.buckets(
      input.asInstanceOf[ArrayData], signs, dim, numPlanes, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("hyperplaneSigns", signs, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HyperplaneBucketsExpr.buckets(
         |  $c, $signsRef, $dim, $numPlanes, $numTables);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

object HyperplaneBucketsExpr {

  /** signs((t*numPlanes + p)*dim + j) = ±1 matching the parity of Spark's
    * `xxhash64(t*1000 + p, j)` on int literals: XXH64.hashInt folded left
    * to right from seed 42. */
  def signMatrix(dim: Int, numPlanes: Int, numTables: Int): Array[Byte] = {
    val out = new Array[Byte](numTables * numPlanes * dim)
    var t = 0
    while (t < numTables) {
      var p = 0
      while (p < numPlanes) {
        val seed = XXH64.hashInt(t * 1000 + p, 42L)
        val base = (t * numPlanes + p) * dim
        var j = 0
        while (j < dim) {
          out(base + j) =
            if ((XXH64.hashInt(j, seed) & 1L) == 1L) 1 else -1
          j += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }

  def buckets(emb: ArrayData, signs: Array[Byte], dim: Int, numPlanes: Int,
              numTables: Int): ArrayData = {
    val n = emb.numElements()
    // fold null algebra: an array shorter than dim (embedding side padded
    // with nulls) or any null element ⇒ every plane sum is NULL ⇒ every
    // bit 0 (the when() otherwise-branch)
    var wellFormed = n >= dim
    if (wellFormed) {
      var j = 0
      while (j < n && wellFormed) {
        if (emb.isNullAt(j)) wellFormed = false
        j += 1
      }
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = t.toLong << 32
      if (wellFormed) {
        var p = 0
        while (p < numPlanes) {
          val base = (t * numPlanes + p) * dim
          var s = 0.0
          var j = 0
          while (j < dim) {
            val x = emb.getFloat(j).toDouble
            s += (if (signs(base + j) > 0) x else -x)
            j += 1
          }
          // elements past dim: the index side of zip_with is null there,
          // xxhash64 skips the null child, so the sign is the parity of
          // the plane seed itself (same for every extra element)
          if (n > dim) {
            val extraPositive =
              (XXH64.hashInt(t * 1000 + p, 42L) & 1L) == 1L
            while (j < n) {
              val x = emb.getFloat(j).toDouble
              s += (if (extraPositive) x else -x)
              j += 1
            }
          }
          if (s > 0) bucket |= (1L << p)
          p += 1
        }
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def hyperplane_buckets(emb: Column, dim: Int, numPlanes: Int,
                         numTables: Int): Column =
    ColumnBridge.column(HyperplaneBucketsExpr(
      ColumnBridge.expression(emb), dim, numPlanes, numTables))
}
