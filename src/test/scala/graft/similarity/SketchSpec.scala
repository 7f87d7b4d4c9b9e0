package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.text.TextOps

class SketchSpec extends SparkTestBase {

  test("HLL sketch estimate within 5% of exact distinct count") {
    val terms = Tables.load(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val exact = terms.select(countDistinct("term")).head.getLong(0)
    val approx = terms
      .select(expr("hll_sketch_estimate(hll_sketch_agg(term))")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("count-min estimates never undercount and respect the eps*N bound") {
    val terms = Tables.load(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val total = terms.count()
    val eps = 0.0001
    val cms = terms.agg(
      expr(s"count_min_sketch(term, ${eps}d, 0.99d, 42)").as("cms"))
    val checked = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("est", graft.functions.CountMin.cms_estimate(
        org.apache.spark.sql.graftshim.ColumnBridge.scalarSubquery(cms),
        col("term")))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val (n, est) = (r.getLong(1), r.getLong(2))
      assert(est >= n, s"${r.getString(0)}: undercount $est < $n")
      assert(est <= n + (eps * total).toLong + 1,
        s"${r.getString(0)}: $est exceeds $n + eps*N")
    }
  }

  test("cms_estimate agrees between interpreted and codegen paths") {
    import spark.implicits._
    val terms = Seq("a", "a", "b", "c", "a", "b").toDF("term").repartition(2)
    val cms = terms.agg(
      expr("count_min_sketch(term, 0.001d, 0.99d, 7)").as("cms"))
    val sub = org.apache.spark.sql.graftshim.ColumnBridge.scalarSubquery(cms)
    val est = terms.distinct()
      .withColumn("est", graft.functions.CountMin.cms_estimate(sub, col("term")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 3 && est("b") >= 2 && est("c") >= 1)
    // tiny domain, wide sketch: estimates are exact here
    assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("HLL sketches merge across groups to the global estimate") {
    val docs = Tables.load(spark, sfDir, "documents")
    val terms = docs.select(col("lang"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val perLang = terms.groupBy("lang")
      .agg(expr("hll_sketch_agg(term)").as("sk"))
    val merged = perLang
      .select(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head.getLong(0)
    val global = terms
      .select(expr("hll_sketch_estimate(hll_sketch_agg(term))")).head.getLong(0)
    // union of per-group sketches equals the single-pass sketch exactly
    assert(merged == global)
  }
}
