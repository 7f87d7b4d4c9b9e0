package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RankFusionSpec extends SparkTestBase {

  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("rrf_e9").desc, col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("exact integer contributions; a doc in BOTH lists outranks a " +
      "better single-list doc (the RRF property)") {
    val l1 = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank").repartition(2)
    val l2 = Seq((3L, 1), (4L, 2)).toDF("id", "rank").repartition(2)
    val got = collect(RankFusion.rrf(Seq(l1, l2)))
    // round(1e9/61)=16393443, /62=16129032, /63=15873016
    assert(got == Seq(
      (3L, 15873016L + 16393443L, 2L), // rank 3 + rank 1, two lists
      (1L, 16393443L, 1L), // single-list rank 1 — beaten by the dual doc
      (2L, 16129032L, 1L),
      (4L, 16129032L, 1L)), got.toString)
  }

  test("duplicate id WITHIN one list collapses to its best rank — one " +
      "contribution, n_lists not inflated") {
    val l1 = Seq((7L, 3), (7L, 41), (8L, 1)).toDF("id", "rank")
    val l2 = Seq((9L, 1)).toDF("id", "rank")
    val got = collect(RankFusion.rrf(Seq(l1, l2)))
    assert(got == Seq(
      (8L, 16393443L, 1L), (9L, 16393443L, 1L),
      (7L, 15873016L, 1L)), // rank 3 only; the rank-41 duplicate is gone
      got.toString)
  }

  test("partition-invariant (integer sums, no float-order drift)") {
    val rnd = new scala.util.Random(5L)
    val lists = Seq.fill(3) {
      rnd.shuffle((0L until 40L).toList).take(25).zipWithIndex
        .map { case (id, i) => (id, i + 1) }.toDF("id", "rank")
    }
    val a = collect(RankFusion.rrf(lists.map(_.repartition(1))))
    val b = collect(RankFusion.rrf(lists.map(_.repartition(7))))
    assert(a == b && a.nonEmpty)
  }
}
