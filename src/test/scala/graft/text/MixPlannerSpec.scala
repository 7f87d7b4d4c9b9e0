package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[MixPlanner.epochAllocation]] — the single-round cap contract on hand
  * sources: A = 100 tokens, B = 400 tokens, C = 0 tokens.
  * s_A = 10e6, s_B = 20e6, s_C = 0 → shares 333333 / 666666 / 0 ppm.
  */
class MixPlannerSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    ("A", 60L), ("A", 40L), ("B", 400L), ("C", 0L))
    .toDF("source", "w").repartition(2)

  private def plan(budget: Long, cap: Long) =
    MixPlanner.epochAllocation(docs, "source", col("w"), budget, cap)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap

  test("cap binds the over-asked source; the rest keep their share") {
    val p = plan(budget = 600L, cap = 150L)
    // A: want 600·333333/1e6 = 199, cap 150 → alloc 150, 1.500 epochs
    assert(p("A") === ((100L, 333333L, 199L, 150L, 1500L)))
    // B: want 399, cap 600 → uncapped, 0.997 epochs
    assert(p("B") === ((400L, 666666L, 399L, 399L, 997L)))
    // C: empty source — all zeros, no division by zero
    assert(p("C") === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("zero budget allocates nothing") {
    val p = plan(budget = 0L, cap = 150L)
    assert(p.values.forall { case (_, _, want, alloc, ep) =>
      want == 0L && alloc == 0L && ep == 0L })
  }

  test("a generous cap leaves every source at its temperature share") {
    val p = plan(budget = 600L, cap = 10000L)
    assert(p("A")._4 === 199L && p("B")._4 === 399L)
  }

  test("an all-empty corpus plans all zeros instead of dividing by zero") {
    val empty = Seq(("A", 0L), ("B", 0L)).toDF("source", "w")
    val p = MixPlanner.epochAllocation(empty, "source", col("w"),
        600L, 150L)
      .collect().map(r => (r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(p.toSeq === Seq((0L, 0L, 0L), (0L, 0L, 0L)))
  }

  test("invalid cap rejected") {
    intercept[IllegalArgumentException] {
      MixPlanner.epochAllocation(docs, "source", col("w"), 600L, 0L)
    }
  }
}
