package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: Seq[String]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(2)

  test("identical distributions give exactly zero PSI (p == q => " +
      "integer term 0, no float residue)") {
    val d = mk(Seq("a", "a", "b", "c"))
    val got = Drift.psi(d, d, Seq("v" -> col("v")))
      .orderBy("bucket").collect()
    assert(got.map(_.getAs[Long]("psi_e9")).toSeq == Seq(0L, 0L, 0L))
    assert(got.map(_.getAs[Long]("psi_total_e9")).toSeq ==
      Seq(0L, 0L, 0L))
  }

  test("disjoint distributions cross the 0.2 alert line; term matches " +
      "the closed-form smoothed PSI") {
    val ref = mk(Seq.fill(10)("a"))
    val cur = mk(Seq.fill(10)("b"))
    val got = Drift.psi(ref, cur, Seq("v" -> col("v")))
      .orderBy("bucket").collect()
    // smoothing: each side has 10 rows, 2 observed buckets
    // bucket a: p = 11/12, q = 1/12; bucket b symmetric
    val p = 11.0 / 12; val q = 1.0 / 12
    val want = math.round((p - q) * math.log(p / q) * 1e9)
    assert(got.map(r => (r.getAs[String]("bucket"),
      r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
      r.getAs[Long]("psi_e9"))).toSeq ==
      Seq(("a", 10L, 0L, want), ("b", 0L, 10L, want)))
    assert(got.head.getAs[Long]("psi_total_e9") == 2 * want)
    assert(got.head.getAs[Long]("psi_total_e9") > 200000000L)
  }

  test("multiple features are independent partitions; nulls bucket as " +
      "<null>; single scan per side (one Generate, one aggregate)") {
    val ref = Seq((1L, Some("x"), 10), (2L, None, 20))
      .toDF("id", "v", "n").repartition(2)
    val cur = Seq((3L, Some("x"), 10), (4L, Some("y"), 20))
      .toDF("id", "v", "n").repartition(2)
    val out = Drift.psi(ref, cur,
      Seq("v" -> col("v"), "band" -> (col("n") / 10).cast("long")))
    val got = out.orderBy("feature", "bucket").collect()
      .map(r => (r.getAs[String]("feature"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))).toSeq
    assert(got == Seq(
      ("band", "1", 1L, 1L), ("band", "2", 1L, 1L),
      ("v", "<null>", 1L, 0L), ("v", "x", 1L, 1L), ("v", "y", 0L, 1L)),
      got.toString)
    // per-feature totals only sum within the feature
    val totals = out.select("feature", "psi_total_e9").distinct().collect()
      .map(r => r.getAs[String]("feature") -> r.getAs[Long]("psi_total_e9"))
      .toMap
    assert(totals("band") == 0L)
    assert(totals("v") > 0L)
    val plan = out.queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(plan).size == 2,
      s"expected one explode per side:\n$plan")
  }

  test("guards: empty feature list rejects") {
    val d = mk(Seq("a"))
    intercept[IllegalArgumentException](Drift.psi(d, d, Seq.empty))
  }
}
