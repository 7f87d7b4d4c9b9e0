package graft.plans

import graft.SparkTestBase
import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native as-of operator must be bit-identical to the union-window
  * composition it accelerates — every test drives BOTH and compares. */
class AsOfNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def leftFixture = Seq(
    ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 5L, "c"),
    ("u2", 100L, "d"), // key with no right rows at all
    ("u3", 7L, "e"),   // match exactly at the boundary time
    ("u4", 1L, "f")    // right rows exist but all later
  ).toDF("k", "t", "payload").repartition(2)

  private def rightFixture = Seq(
    ("u1", 8L, 1.0), ("u1", 10L, 2.0), ("u1", 15L, 3.0),
    ("u3", 7L, 4.0),
    ("u4", 9L, 5.0)
  ).toDF("k", "t", "v").repartition(2)

  test("parity with the window form on the fixture (matches, boundary, " +
      "no-match key, all-later key)") {
    val window = AsOfJoin.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    val native = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(native) == sortedRows(window))
    // spot semantics: u1@20 → 15/3.0, u3@7 → boundary match 4.0, u4 → null
    val m = native.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> Option(r.get(3))).toMap
    assert(m(("u1", 20L)) == Some(3.0))
    assert(m(("u3", 7L)) == Some(4.0))
    assert(m(("u4", 1L)) == None)
    assert(m(("u2", 100L)) == None)
  }

  test("parity on null edges: null left time, null right time") {
    val l = Seq(("a", Some(10L), "x"), ("a", None, "y"), ("b", None, "z"))
      .toDF("k", "t", "payload").repartition(2)
    val r = Seq(("a", Some(5L), 1.0), ("a", None, 9.0), ("c", Some(1L), 7.0))
      .toDF("k", "t", "v").repartition(2)
    val window = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    val native = AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("parity on right-side ties (same key and time): the data-derived " +
      "tie-break picks the same row as the window ordering") {
    val l = Seq(("a", 10L, "x")).toDF("k", "t", "payload").repartition(2)
    val r = Seq(("a", 10L, 1.0), ("a", 10L, 2.0), ("a", 10L, 3.0))
      .toDF("k", "t", "v").repartition(2)
    val window = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    val native = AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("tolerance parity with asOfTolerance (stale matches nulled)") {
    val window = AsOfJoin.asOfTolerance(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"), tolerance = 3L)
    val native = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"), tolerance = Some(3L))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("parity on sf0.001 events (both sides derived from one source — " +
      "the self-join exprId path)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "value")
    // both projected to one explicit column order: the window form emits
    // keys first, the native form keeps left.output order — same values
    val cols = Seq("event_id", "user_id", "ts", "asof_value")
    val window = AsOfJoin.asOf(purchases, errors,
      Seq("user_id"), "ts", "ts", Seq("value"))
      .select(cols.map(col): _*)
    val native = AsOfNative.asOf(purchases, errors,
      Seq("user_id"), "ts", "ts", Seq("value"))
      .select(cols.map(col): _*)
    assert(native.count() == purchases.count()) // every left row survives
    assert(sortedRows(native) == sortedRows(window))
  }

  test("plan shape: AsOfJoinExec present, one exchange per side, no Window " +
      "or Join fallback") {
    val native = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    native.collect() // materialize (resolves any AQE re-planning)
    // AQE's toString prints the Final AND Initial plans — count in the
    // final section only
    val full = native.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(plan.contains("AsOfJoin ["), s"native exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window fallback leaked in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"join fallback leaked in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }
}
