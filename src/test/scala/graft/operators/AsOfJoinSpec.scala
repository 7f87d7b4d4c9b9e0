package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("asOf attaches latest right row at-or-before left time, null when none") {
    val left = Seq(
      (1L, "k1", ts(100)),
      (2L, "k1", ts(200)),
      (3L, "k1", ts(50)),   // before any right row
      (4L, "k2", ts(100))   // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", ts(100), 10.0), // equal timestamp → visible (<= semantics)
      ("k1", ts(150), 15.0)
    ).toDF("k", "t", "v")

    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .select(col("id"), col("asof_v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(got(1L).contains(10.0)) // t=100 sees the t=100 right row
    assert(got(2L).contains(15.0)) // latest prior
    assert(got(3L).isEmpty)        // nothing at or before t=50
    assert(got(4L).isEmpty)        // no right rows for k2
  }

  test("asOf attaches all columns from the SAME matched right row and " +
      "keeps its genuine NULLs") {
    val left = Seq((1L, "k1", ts(200))).toDF("id", "k", "t")
    // latest matched right row has v = NULL and w = 2: a per-column
    // last(ignoreNulls) would skip the NULL v and attach the stale 1.0
    // from the older row, mixing columns across right rows
    val right = Seq(
      ("k1", ts(100), Option(1.0), Option(9.0)),
      ("k1", ts(150), None, Option(2.0))
    ).toDF("k", "t", "v", "w")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v", "w"))
      .select(col("asof_v"), col("asof_w")).head
    assert(r.isNullAt(0), s"expected the matched row's NULL v, got $r")
    assert(r.getDouble(1) == 2.0, s"expected the matched row's w, got $r")
  }

  test("asOf preserves left cardinality") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts", Seq("value"))
    assert(joined.count() == l.count())
  }
}
