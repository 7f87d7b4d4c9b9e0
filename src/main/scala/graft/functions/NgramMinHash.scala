package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native kernels for the corpus-dedup hot path: token-array → 64-bit
  * n-gram ids, and gram ids → k-slot MinHash signature. Both are
  * bit-identical to their declarative reference forms (asserted in
  * SimilaritySpec) but run as one tight loop per row instead of per-element
  * lambda interpretation — the tokenize→gram→signature pipeline is the
  * map-side cost of every dedup/decontaminate query, so this is the single
  * hottest kernel in the corpus-prep suite.
  *
  * Hash compatibility contract (do not change): Spark's `xxhash64(a, b)`
  * folds children through XXH64 with seed 42 — `hash = XXH64(b, XXH64(a,
  * 42))` — typed per child (hashUnsafeBytes for strings, hashLong for
  * longs, hashInt's 4-byte path for ints). The loops below replicate that
  * exactly so native and declarative forms agree bit-for-bit.
  */
case class NgramHash(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes expects ARRAY<STRING> tokens, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHash.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHash.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHash =
    copy(child = newChild)
}

object NgramHash {
  /** Matches `transform(toks, t => xxhash64(t))` + the zip_with ladder
    * `acc = xxhash64(acc, nextTokenHash)` of TextOps.ngramHashesFold. */
  def ngrams(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      val s = tokens.getUTF8String(i)
      // null token hashes to the xxhash64 seed, like the declarative form
      th(i) = if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
      i += 1
    }
    val m = math.max(len - (n - 1), 0)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var g = th(i)
      var j = 1
      while (j < n) {
        // xxhash64(g, th(i+j)) = hashLong(th(i+j), hashLong(g, seed))
        g = XXH64.hashLong(th(i + j), XXH64.hashLong(g, 42L))
        j += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  def ngram_hashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(NgramHash(ColumnBridge.expression(tokens), n))
}

/** k-slot MinHash signature over 64-bit gram ids: sig[i] = min over grams
  * of xxhash64(i, gram), with i typed INT as in the declarative
  * `sequence(0, k-1)` form. Empty input ⇒ all slots Long.MaxValue. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects ARRAY<BIGINT> gram ids, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.signature($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  // slot seeds are gram- AND row-independent: hoist xxhash64's first fold
  // step, memoized per k (recomputing k hashInts per ROW would tax the
  // hottest kernel in the suite). The declarative form's slot indices come
  // from sequence(0, k-1) — IntegerType — and HashExpression hashes ints
  // with XXH64.hashInt (4-byte path, NOT hashLong of the widened value),
  // so the seed must use hashInt to stay bit-identical.
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, { kk =>
      val s = new Array[Long](kk)
      var i = 0
      while (i < kk) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
      s
    })

  def signature(grams: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val seeds = seedsFor(k)
    val n = grams.numElements()
    var g = 0
    var i = 0
    while (g < n) {
      if (grams.isNullAt(g)) {
        // fold parity: xxhash64(i, NULL) skips the null child, so the
        // slot candidate is the seed itself — NOT a phantom gram id 0
        i = 0
        while (i < k) {
          if (seeds(i) < sig(i)) sig(i) = seeds(i)
          i += 1
        }
      } else {
        val id = grams.getLong(g)
        i = 0
        while (i < k) {
          val h = XXH64.hashLong(id, seeds(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  def minhash_sig(grams: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(grams), k))
}
