package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketed range join equals naive inequality join") {
    val points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("id", "p")
    val intervals = Seq((0L, 100L), (90L, 250L), (900L, 1000L), (400L, 401L))
      .toDF("s", "e")
    val naive = points.join(intervals, col("p") >= col("s") && col("p") < col("e"))
    val bucketed = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 64)
    assert(bucketed.count() == naive.count())
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
  }

  test("fractional values: point inside the interval's final sub-integer span is matched") {
    // regression: floor((end-1)/width) dropped bucket 2 for [1.0, 2.5),
    // losing point 2.3 even though 1.0 <= 2.3 < 2.5
    val points = Seq((1L, 2.3), (2L, 2.6)).toDF("id", "p")
    val intervals = Seq((1.0, 2.5)).toDF("s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("edge inclusivity: start inclusive, end exclusive") {
    val points = Seq((1L, 100L), (2L, 199L), (3L, 200L)).toDF("id", "p")
    val intervals = Seq((100L, 200L)).toDF("s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("intervalOverlap equals the naive overlap join, emitting each pair " +
      "exactly once even when it spans many shared buckets") {
    val a = Seq((1L, 0L, 1000L), (2L, 500L, 600L), (3L, 2000L, 2100L),
      (4L, 950L, 2050L)).toDF("a_id", "a_s", "a_e")
      .withColumn("k", lit("g")).repartition(2)
    val b = Seq((10L, 100L, 900L), (11L, 590L, 610L), (12L, 1990L, 2200L),
      (13L, 5000L, 5001L)).toDF("b_id", "b_s", "b_e")
      .withColumn("k", lit("g")).repartition(2)
    // tiny bucket width: overlapping pairs share MANY buckets — the
    // canonical-bucket rule must still emit each exactly once
    val got = RangeJoin.intervalOverlap(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 16)
      .select("a_id", "b_id")
    val naive = a.join(b, Seq("k"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id")
    val gotRows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naiveRows = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotRows.sorted == naiveRows.sorted,
      s"got ${gotRows.sorted} vs naive ${naiveRows.sorted}")
    assert(gotRows.distinct.size == gotRows.size, s"duplicate pairs: $gotRows")
    // end-exclusivity: touching intervals ([x, y) meets [y, z)) don't pair
    assert(!gotRows.contains((3L, 10L)))
  }
}
