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
}
