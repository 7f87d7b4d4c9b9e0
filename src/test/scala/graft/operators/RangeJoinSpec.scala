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
}
