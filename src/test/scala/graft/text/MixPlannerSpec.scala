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

  // --- executeAllocation ----------------------------------------------

  private def docsWithIds = Seq(
    ("A", 1L, 60L), ("A", 2L, 40L), ("B", 3L, 400L), ("C", 4L, 0L))
    .toDF("source", "doc_id", "w").repartition(2)

  private def exec(budget: Long, cap: Long) =
    MixPlanner.executeAllocation(docsWithIds, "source", "doc_id",
        col("w"), budget, cap)
      .collect().map(r => r.getLong(1) ->
        ((r.getString(0), r.getLong(2), r.getLong(3)))).toMap

  test("executeAllocation == a plain-Scala reference replay on the " +
      "real corpus (budget law and prefix maximality follow)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    val weight = TextOps.tokenCountWs(col("text")).cast("long")
    val planned = MixPlanner.epochAllocation(d, "source", weight,
        50000L, 200L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    val got = MixPlanner.executeAllocation(d, "source", "doc_id",
        weight, 50000L, 200L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    def draw(id: Long): BigInt =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix0:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val allDocs = d.select(col("source"),
        col("doc_id").cast("long").as("doc_id"), weight.as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = allDocs.groupBy(_._1).flatMap { case (s, rows) =>
      val (toks, alloc) = planned(s)
      val eFull = if (toks == 0) 0L else alloc / toks
      val rem = alloc - eFull * toks
      var cum = 0L
      rows.sortBy(r => (draw(r._2), r._2)).toSeq.flatMap { r =>
        cum += r._3
        val n = eFull + (if (alloc > 0 && cum <= rem) 1L else 0L)
        if (n >= 1) Some((s, r._2, r._3, n)) else None
      }
    }.toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("executeAllocation: capped source repeats e_full times; a doc " +
      "overflowing its source's ppm-floored alloc stays OUT (hand " +
      "sources)") {
    // budget 600, cap 150: A (100 toks) caps at alloc 150 → e_full = 1,
    // rem = 50: both A docs repeat ≥ 1, the prefix may add one more to
    // whichever draws first IF it fits in 50 (only doc 2, w=40, can).
    // B's share floors to 399 ppm-wise (want 600·666666÷1e6), so its
    // single 400-token doc OVERFLOWS the prefix — strict-prefix
    // semantics leave B empty rather than over-filling by 1 token.
    val got = exec(600L, 150L)
    assert(got.contains(1L) && got.contains(2L))
    assert(got(1L)._3 >= 1L && got(2L)._3 >= 1L)
    assert(60L * got(1L)._3 + 40L * got(2L)._3 <= 150L)
    assert(got(1L)._3 === 1L, "doc 1 (w=60) cannot fit the 50-token rem")
    assert(!got.contains(3L), "B's 400-token doc must overflow alloc 399")
    // C has zero tokens -> zero alloc -> absent (incl. its w=0 doc)
    assert(!got.contains(4L))
  }

  test("executeAllocation: zero budget selects nothing") {
    assert(exec(0L, 150L).isEmpty)
  }

  private def reweight(rows: Seq[(String, Long, Long)]) =
    MixPlanner.reweightByLoss(
        rows.toDF("source", "n_trans", "sum_logp_e6").repartition(2),
        "source")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("reweightByLoss: hand vector — the lossier domain is " +
      "up-weighted by exactly (1000 + excess/1000) over its share") {
    // A: 100 transitions at avg nll 2.0 nats; B: 100 at avg 5.0 nats
    val got = reweight(Seq(
      ("A", 60L, -120_000_000L), ("A", 40L, -80_000_000L),
      ("B", 100L, -500_000_000L)))
    val (_, _, avgA, exA, shareA, wA) = got("A")
    val (_, _, avgB, exB, shareB, wB) = got("B")
    assert(avgA === 2_000_000L && avgB === 5_000_000L)
    assert(exA === 0L && exB === 3_000_000L)
    assert(shareA === 500000L && shareB === 500000L)
    // raw: A = 500000*1000, B = 500000*4000 → weights 200000 / 800000
    assert(wA === 200000L && wB === 800000L)
  }

  test("reweightByLoss: equal losses reproduce the shares; a scored-" +
      "empty source gets zero weight and is excluded from the baseline") {
    val got = reweight(Seq(
      ("A", 300L, -600_000_000L), // avg 2.0
      ("B", 100L, -200_000_000L), // avg 2.0
      ("C", 0L, 0L))) // never scored
    assert(got("C")._6 === 0L && got("C")._4 === 0L)
    // shares by transitions: 750000 / 250000; equal excess → weights
    // equal shares
    assert(got("A")._6 === 750000L && got("B")._6 === 250000L)
    // baseline must come from A/B (2.0), not C's zero
    assert(got("A")._5 === 750000L)
  }

  test("reweightByLoss: all-empty input yields all-zero weights, " +
      "no division by zero") {
    val got = reweight(Seq(("A", 0L, 0L), ("B", 0L, 0L)))
    assert(got.values.forall(_._6 === 0L))
  }
}
