package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed (±1) random projection — Achlioptas-style Johnson–Lindenstrauss
  * dimensionality reduction for embedding columns, the cheap front-end to
  * similarity search when even the Matryoshka prefix is too wide.
  *
  * Design for cross-engine exactness (the repo-wide oracle discipline):
  *
  *   - the projection matrix is DETERMINISTIC, derived from md5 parity of
  *     `"rp:<i>:<j>"` — no RNG state to ship, and any engine that can md5
  *     a string reproduces the matrix bit-for-bit (the winnowing-
  *     fingerprint precedent for md5 as the shared hash);
  *   - input components are integer-quantized first (`round(x·1e6)`, the
  *     d_budget_select convention), so projected values are exact BIGINT
  *     sums — no float accumulation order to match.
  *
  * Scale shape: the sign matrix is `dimIn × dimOut` (a few KB) embedded
  * as plan literals — the projection is MAP-ONLY, zero shuffles, and
  * column-prunes to just (id, embedding). The HOF fold pays the known
  * boxed-closure tax (NOTES round-7 measurement: 4-15× vs a native
  * kernel); at gate scale that is irrelevant, and the upgrade path is the
  * same `doGenCode` treatment DotProduct/WinnowKeys got.
  */
object RandomProjection {

  /** +1 iff the first hex digit of md5("rp:i:j") is even — the one sign
    * definition both engines implement (DuckDB twin:
    * `(strpos('0123456789abcdef', substr(md5(s),1,1)) - 1) % 2`). */
  private[graft] def sign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
    // first hex digit = high nibble of byte 0
    if (((hex(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** Quantized embedding: component -> round(x·1e6) as BIGINT. */
  private def quantized(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000000.0)).cast("long"))

  /** The projected vector as an `array<bigint>` column expression —
    * component j is Σᵢ round(xᵢ·1e6)·sign(i,j). Map-only. Primary
    * implementation is the native codegen'd kernel
    * ([[graft.functions.SignedProjectExpr]] — quantize once, then
    * primitive sign-sum loops); [[projectedVecFold]] is the declarative
    * reference semantics (bit-identical on well-formed input, asserted
    * in RandomProjectionSpec; the fold re-evaluates the quantization
    * subtree once per OUTPUT dim and pays boxed HOF dispatch — the
    * measured 2.7× on the serving scan). */
  private def projectedVec(emb: Column, dimIn: Int, dimOut: Int): Column =
    graft.functions.SignedProjectExpr.signed_project(emb, dimIn, dimOut)

  /** Declarative fold form — reference semantics for the kernel. */
  private[similarity] def projectedVecFold(emb: Column, dimIn: Int,
                                           dimOut: Int): Column = {
    val qv = quantized(emb)
    array((0 until dimOut).map { j =>
      val signs = array((0 until dimIn).map(i => lit(sign(i, j).toLong)): _*)
      aggregate(zip_with(qv, signs, (v, s) => v * s), lit(0L), (a, b) => a + b)
    }: _*)
  }

  /** Project `idCol, embCol` rows to `dimOut` signed-sum components.
    * Output is exploded long form `(vec_id, dim, proj)` — one exact
    * BIGINT per output component, directly comparable across engines
    * and directly usable as a reduced feature table. */
  def projectSigned(df: DataFrame, dimIn: Int, dimOut: Int,
                    idCol: String = "vec_id",
                    embCol: String = "embedding"): DataFrame = {
    require(dimIn >= 1 && dimOut >= 1,
      s"projectSigned: dimIn=$dimIn, dimOut=$dimOut must be >= 1")
    df.select(col(idCol).as("vec_id"),
        posexplode(projectedVec(col(embCol), dimIn, dimOut))
          .as(Seq("dim", "proj")))
      .select(col("vec_id"), col("dim"), col("proj"))
  }

  /** Top-k nearest neighbors under the PROJECTED integer dot product —
    * the coarse stage a JL-reduced index serves. Ties break on
    * neighbor_id ([[Similarity.bruteTopK]] convention). Integer scores,
    * so the ranking is exactly SQL-replayable. */
  def projectedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    dimIn: Int, dimOut: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pq = broadcast(queries.select(col("vec_id").as("query_id"),
      projectedVec(col("embedding"), dimIn, dimOut).as("q_proj")))
    val pc = corpus.select(col("vec_id").as("neighbor_id"),
      projectedVec(col("embedding"), dimIn, dimOut).as("c_proj"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    pc.join(pq, col("query_id") =!= col("neighbor_id"))
      // per-PAIR integer dot is the hot path (corpus × queries rows) —
      // the native DotCodes kernel, not a boxed zip_with fold; integer
      // addition is associative so exactness is trivial either way
      .withColumn("score",
        graft.functions.DotCodes.dot_codes(col("q_proj"), col("c_proj")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }
}
