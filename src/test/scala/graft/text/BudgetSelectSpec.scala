package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[BudgetSelect.selectToBudget]] — the histogram-cut contract on hand
  * vectors where every bin boundary is knowable (binWidth 10):
  * a(q95,w5) b(q92,w5) → bin 9; c(q85,w4) d(q83,w4) → bin 8;
  * e(q75,w10) → bin 7.
  */
class BudgetSelectSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    ("a", 95L, 5L), ("b", 92L, 5L), ("c", 85L, 4L),
    ("d", 83L, 4L), ("e", 75L, 10L))
    .toDF("doc_id", "q", "w").repartition(2)

  private def ids(budget: Long) = BudgetSelect.selectToBudget(
      docs, "doc_id", col("q"), col("w"), budget, binWidth = 10L)
    .select("doc_id").collect().map(_.getString(0)).sorted.toSeq

  test("full bins whole, cut bin prefix by (quality desc, id)") {
    // budget 16: bin 9 whole (10), bin 8 is cut with remainder 6 → c
    // fits (4), d would reach 8 — excluded
    assert(ids(16) === Seq("a", "b", "c"))
  }

  test("budget below the best bin selects only the cut-bin prefix") {
    assert(ids(3) === Seq.empty) // a alone (w 5) already overflows 3
    assert(ids(5) === Seq("a"))
  }

  test("budget >= total selects everything; zero budget nothing") {
    assert(ids(30) === Seq("a", "b", "c", "d", "e"))
    assert(ids(0) === Seq.empty)
  }

  test("cut-bin ties break by id") {
    val tied = Seq(("x", 85L, 3L), ("y", 85L, 3L), ("z", 85L, 3L))
      .toDF("doc_id", "q", "w").repartition(2)
    val got = BudgetSelect.selectToBudget(tied, "doc_id", col("q"),
      col("w"), budget = 6, binWidth = 10L)
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(got === Seq("x", "y"))
  }

  test("law over seeded random corpora: total within budget, and the " +
      "best unselected row would always overflow it") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val n = 5 + rnd.nextInt(40)
      val budget = rnd.nextInt(2000).toLong
      val rows = (1L to n).map(id =>
        (id, rnd.nextInt(100).toLong, 1L + rnd.nextInt(200)))
      val d = rows.toDF("doc_id", "q", "w").repartition(3)
      val sel = BudgetSelect.selectToBudget(d, "doc_id", col("q"),
        col("w"), budget, binWidth = 10L).collect()
      val total = sel.map(_.getLong(2)).sum
      assert(total <= budget, s"trial $trial: $total > $budget")
      val selIds = sel.map(_.getLong(0)).toSet
      val best = rows.filterNot(r => selIds(r._1))
        .sortBy(r => (-r._2, r._1)).headOption
      best.foreach { b =>
        assert(total + b._3 > budget,
          s"trial $trial: best unselected ${b._1} (w=${b._3}) fits " +
            s"($total + ${b._3} <= $budget) — not a maximal prefix")
      }
    }
  }

  test("real corpus: budget respected, selection is the greedy prefix, " +
      "invariant to partitioning") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    def sel(parts: Int) = BudgetSelect.selectToBudget(
        d.repartition(parts), "doc_id",
        round(TextOps.qualityScore(col("text")) * 1e6).cast("long"),
        TextOps.tokenCountWs(col("text")).cast("long"),
        budget = 5000, binWidth = 1000L)
    val rows = sel(3).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total <= 5000)
    assert(rows.nonEmpty)
    // maximality at the cut: the best unselected doc would overflow
    val selIds = rows.map(_.getLong(0)).toSet
    val rest = d.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * 1e6).cast("long").as("q"),
        TextOps.tokenCountWs(col("text")).cast("long").as("w"))
      .filter(!col("doc_id").isInCollection(selIds))
      .orderBy(col("q").desc, col("doc_id")).limit(1).collect()
    if (rest.nonEmpty) assert(total + rest.head.getLong(2) > 5000)
    assert(sel(1).collect().map(_.toString).sorted.toSeq ===
      sel(7).collect().map(_.toString).sorted.toSeq)
  }
}
