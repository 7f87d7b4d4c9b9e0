package graft.operators

import graft.SparkTestBase

class SnapshotDiffSpec extends SparkTestBase {

  import spark.implicits._

  test("added / removed / changed classified; unchanged rows OMITTED") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v").repartition(2)
    val after = Seq((2L, "b", 20L), (3L, "C", 30L), (4L, "d", 40L))
      .toDF("k", "s", "v").repartition(2)
    val got = SnapshotDiff.diff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "removed"), (3L, "changed"), (4L, "added")),
      got.toString)
  }

  test("null payloads compare null-safely: null→value and value→null " +
      "are CHANGED, null→null is unchanged") {
    val before = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("k", "s")
    val after = Seq((1L, None), (2L, Some("y")), (3L, None))
      .toDF("k", "s").repartition(2)
    val got = SnapshotDiff.diff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "changed"), (2L, "changed")), got.toString)
  }

  test("guards: empty keys, schema mismatch, key-only schema reject") {
    val a = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, a, Seq.empty))
    val b = Seq((1L, "x")).toDF("k", "other")
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, b, Seq("k")))
    val keyOnly = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException](
      SnapshotDiff.diff(keyOnly, keyOnly, Seq("k")))
  }
}
