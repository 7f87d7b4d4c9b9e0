package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("hand-computed Laplace bigram scores") {
    // corpus = one doc "a b a b": transitions (a,b)x2 (b,a)x1;
    // ctx a=2 b=1; V=2; P(b|a)=(2+1)/(2+2)=3/4, P(a|b)=(1+1)/(1+2)=2/3
    // round(ln(3/4)*1e6) = -287682, round(ln(2/3)*1e6) = -405465
    // sum = 2*(-287682) - 405465 = -980829; avg = -(980829 div 3)
    val got = NgramLm.score(docs("a b a b"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((0L, 3L, -980829L, -326943L)), got.toString)
  }

  test("short and empty docs keep a zero row (never vanish)") {
    val got = NgramLm.score(docs("a b a b", "solo", ""), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L), got.toString)
    assert(got.drop(1) == Seq((1L, 0L), (2L, 0L)), got.toString)
  }

  test("n_trans equals token count - 1 on the synthetic corpus; " +
      "scores are strictly negative for multi-token docs") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val s = NgramLm.score(d, "doc_id", "text")
    val expected = d.select(col("doc_id"),
      greatest(size(TextOps.tokens(col("text"))) - 1, lit(0))
        .cast("long").as("want"))
    val bad = s.join(expected, "doc_id")
      .filter(col("n_trans") =!= col("want")).count()
    assert(bad == 0)
    val nonNeg = s.filter(col("n_trans") >= 1 && col("sum_logp_e6") >= 0)
      .count()
    assert(nonNeg == 0, s"$nonNeg docs with non-negative log-prob sums")
  }

  test("train emits the bigram count table") {
    val t = NgramLm.train(docs("a b a b", "b a"), "doc_id", "text")
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(t == Seq(("a", "b", 2L), ("b", "a", 2L)), t.toString)
  }

  // --- trigram stupid backoff -----------------------------------------

  private def backoffRows(model: String, scored: Seq[(Long, String)]) = {
    val (tri, bi, uni, total) = NgramLm.fitBackoff(
      docs(model), "doc_id", "text")
    NgramLm.scoreBackoffWith(scored.toDF("doc_id", "text"),
        "doc_id", "text", tri, bi.localCheckpoint(true), uni, total)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
  }

  test("stupid backoff: all three CASE arms on hand-computed vectors") {
    // model corpus "a b c a b d": uni a2 b2 c1 d1 N=6;
    // bi (a,b)2 (b,c)1 (c,a)1 (b,d)1;
    // tri (a,b,c)1 (b,c,a)1 (c,a,b)1 (a,b,d)1
    val got = backoffRows("a b c a b d", Seq(
      (10L, "a b c d"), // (a,b,c): tri ln(1/2); (b,c,d): uni branch
      (11L, "b b c"),   // (b,b,c): bigram branch ln0.4 + ln(1/2)
      (12L, "a b z"),   // w3 OOV -> position drops -> zero row
      (13L, "xy")))     // short doc -> zero row
    // tri arm: round(ln(1/2)*1e6) = -693147
    // uni arm: 2*(-916291) + round(ln(1/6)*1e6) = -1832582 - 1791759
    val sum10 = -693147L + (-1832582L - 1791759L)
    assert(got(10L) === ((2L, 1L, 0L, 1L, sum10, -(-sum10 / 2L))))
    // bigram arm: c23(b,c)=1, c2=cu(b)=2
    assert(got(11L) === ((1L, 0L, 1L, 0L, -916291L - 693147L,
      -916291L - 693147L)))
    assert(got(12L) === ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(13L) === ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("self-scoring the training corpus attests every trigram " +
      "(n_trans == n_tri everywhere) — why the gate trains on a slice") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val self = NgramLm.scoreBackoff(d, "doc_id", "text")
    assert(self.filter(col("n_trans") =!= col("n_tri")).count() === 0)
  }

  test("held-out scoring keeps all three arms LIVE on the real corpus " +
      "(the gate-query liveness contract)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val (tri, bi, uni, total) = NgramLm.fitBackoff(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val out = NgramLm.scoreBackoffWith(d, "doc_id", "text",
      tri, bi.localCheckpoint(true), uni, total).cache()
    try {
      assert(out.count() === d.count())
      val t = out.agg(sum("n_tri"), sum("n_bi"), sum("n_uni")).collect()(0)
      assert(t.getLong(0) > 0 && t.getLong(1) > 0 && t.getLong(2) > 0,
        s"dead backoff arm: $t")
      // histogram sums to the transition count
      assert(out.filter(col("n_tri") + col("n_bi") + col("n_uni")
        =!= col("n_trans")).count() === 0)
    } finally out.unpersist()
  }
}
