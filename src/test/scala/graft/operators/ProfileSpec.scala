package graft.operators

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {

  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, None, Some(10)),
    (3L, Some("c"), None),
    (4L, Some("a"), Some(30)))
    .toDF("k", "s", "v").repartition(2)

  test("one row per column with exact nulls/distinct/min/max; " +
      "heterogeneous types stringify") {
    val got = Profile.profile(df, Seq("k", "s", "v"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("k", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "c"),   // null not counted as distinct
      ("v", 4L, 1L, 2L, "10", "30")), got.toString)
  }

  test("approxDistinct swaps HLL for the exact count (no Expand in the " +
      "plan); other stats unchanged") {
    val exact = Profile.profile(df, Seq("k", "s"))
    val approxDf = Profile.profile(df, Seq("k", "s"),
      approxDistinct = true)
    val p = approxDf.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"approx path must not Expand:\n$p")
    val pe = exact.queryExecution.executedPlan.toString
    assert(pe.contains("Expand"), "exact multi-distinct plans with Expand")
    val a = approxDf.orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(4), r.getString(5))).toSeq
    val e = exact.orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(4), r.getString(5))).toSeq
    assert(a == e, s"non-distinct stats must agree: $a vs $e")
  }

  test("guards: empty and unknown columns reject") {
    intercept[IllegalArgumentException](Profile.profile(df, Seq.empty))
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
  }
}
