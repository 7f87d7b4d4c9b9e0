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
