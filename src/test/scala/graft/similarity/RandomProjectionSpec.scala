package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class RandomProjectionSpec extends SparkTestBase {

  /** Independent reimplementation of the sign convention (hex-string
    * route, vs the operator's high-nibble route) — a shared bug would
    * have to be in md5 itself. */
  private def signRef(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1 else -1
  }

  test("sign matches the hex-digit-parity reference and is balanced") {
    val signs = for (i <- 0 until 64; j <- 0 until 8)
      yield RandomProjection.sign(i, j)
    val refs = for (i <- 0 until 64; j <- 0 until 8) yield signRef(i, j)
    assert(signs == refs)
    // md5 parity should be near-balanced — catastrophic skew would mean
    // the projection collapses toward a single direction
    val plus = signs.count(_ == 1)
    assert(plus > 150 && plus < 362, s"plus=$plus of ${signs.size}")
  }

  test("projectSigned computes exact signed sums of quantized components") {
    import spark.implicits._
    val v = Array(0.5f, -0.25f, 0.125f, 1.0f)
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding").repartition(2)
    val got = RandomProjection.projectSigned(df, dimIn = 4, dimOut = 3)
      .orderBy("dim").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    val q = v.map(x => math.round(x.toDouble * 1e6)) // exact quarters: no tie subtlety
    val want = (0 until 3).map { j =>
      (j, (0 until 4).map(i => q(i) * signRef(i, j)).sum)
    }
    assert(got.toSeq == want)
  }

  test("native kernel == declarative fold, bit for bit, on the corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val both = emb.select(col("vec_id"),
      graft.functions.SignedProjectExpr.signed_project(
        col("embedding"), 64, 8).as("k"),
      RandomProjection.projectedVecFold(col("embedding"), 64, 8).as("f"))
    assert(both.filter(col("k") =!= col("f")).count() == 0)
    assert(both.filter(col("k").isNull).count() == 0)
  }

  test("kernel nulls on malformed input instead of guessing") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .repartition(2)
    // wrong length (2 != 64) -> NULL, loudly absent
    val r = df.select(graft.functions.SignedProjectExpr
      .signed_project(col("embedding"), 64, 8).as("p")).collect()
    assert(r.head.isNullAt(0))
  }

  test("kernel fails LOUDLY on non-finite and overflowing components, " +
      "like the fold's ANSI cast") {
    import spark.implicits._
    // the fold (round(x*1e6).cast(long)) throws CAST_OVERFLOW under
    // ANSI for NaN and for values past Long range; the kernel must not
    // silently saturate where the reference semantics fail
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, 3.0e14f)) {
      val df = Seq((1L, Seq(bad, 1.0f))).toDF("vec_id", "embedding")
        .repartition(2)
      val e = intercept[Exception] {
        df.select(graft.functions.SignedProjectExpr
          .signed_project(col("embedding"), 2, 2).as("p")).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] &&
        c.getMessage.contains("signed_project")),
        s"for $bad got: $e")
    }
  }

  test("sign-matrix budget: dimIn*dimOut past 2^20 is rejected at " +
      "construction (no 64 MB reference object, no 16M-digest build)") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.SignedProjectExpr.signed_project(
        col("embedding"), 2048, 1024) // 2^21 entries
    }
    assert(e.getMessage.contains("reference-object budget"),
      s"wrong error: ${e.getMessage}")
    // the largest sensible shape stays comfortably inside: 1024 -> 1024
    graft.functions.SignedProjectExpr.signed_project(
      col("embedding"), 1024, 1024) // 2^20 exactly — allowed
  }

  test("projectedTopK ranks by the exact projected integer dot") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val got = RandomProjection.projectedTopK(
      emb.filter(col("vec_id") < 3), emb, k = 2, dimIn = 64, dimOut = 8)
    assert(got.count() == 6)
    // recompute each returned score from projectSigned output
    val proj = RandomProjection.projectSigned(emb, 64, 8)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2)) }
    got.collect().foreach { r =>
      val (q, n, s) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val want = proj(q).zip(proj(n)).map { case (a, b) => a * b }.sum
      assert(s == want, s"query $q neighbor $n")
    }
  }

  test("near-identical vectors stay nearest under projection") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val twin = base.clone(); twin(0) = twin(0) + 1e-4f
    val far = Array.tabulate(64)(i => math.cos(i * 2.3 + 1).toFloat)
    val corpus = Seq((1L, base.toSeq), (2L, twin.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding").repartition(2)
    val top = RandomProjection.projectedTopK(
        corpus.filter(col("vec_id") === 1), corpus, k = 1,
        dimIn = 64, dimOut = 8)
      .collect().head
    assert(top.getLong(2) == 2L) // the twin, not the unrelated vector
  }
}
