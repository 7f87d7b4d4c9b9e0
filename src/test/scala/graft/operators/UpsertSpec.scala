package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UpsertSpec extends SparkTestBase {

  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "s", "v").repartition(2)

  private def source = Seq(
    (2L, "B", 200L),  // matched → update
    (3L, "DEL", 300L), // matched + deleteCond → delete
    (9L, "new", 900L), // source-only → insert
    (8L, "DEL", 800L)) // source-only: deleteCond must NOT suppress insert
    .toDF("k", "s", "v").repartition(2)

  test("all four merge outcomes in one pass; deleteCond applies ONLY to " +
      "matched rows") {
    val got = Upsert.mergeTagged(target, source, Seq("k"),
        deleteCond = Some(col("s") === "DEL"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      (1L, "a", 10L, false),   // target-only, untouched
      (2L, "B", 200L, true),   // updated: source wins whole-row
      (4L, "d", 40L, false),   // target-only
      (8L, "DEL", 800L, true), // source-only insert despite cond text
      (9L, "new", 900L, true)), got.toString) // 3 deleted
  }

  test("merge == mergeTagged minus the audit column; no deleteCond " +
      "keeps every matched row as the source version") {
    val m = Upsert.merge(target, source, Seq("k")).orderBy("k")
    assert(m.columns.toSeq == Seq("k", "s", "v"))
    val got = m.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "DEL", 300L),
      (4L, "d", 40L), (8L, "DEL", 800L), (9L, "new", 900L)), got.toString)
  }

  test("multi-column keys and column-order robustness (source columns " +
      "permuted)") {
    val t = Seq((1L, "x", 5L), (1L, "y", 6L)).toDF("k", "s", "v")
    val src = Seq(("y", 60L, 1L)).toDF("s", "v", "k") // permuted order
    val got = Upsert.merge(t, src, Seq("k", "s")).orderBy("k", "s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((1L, "x", 5L), (1L, "y", 60L)), got.toString)
  }

  test("guards: empty keys and schema mismatch reject") {
    intercept[IllegalArgumentException](
      Upsert.merge(target, source, Seq.empty))
    val bad = Seq((1L, "a")).toDF("k", "other")
    intercept[IllegalArgumentException](
      Upsert.merge(target, bad, Seq("k")))
  }
}
