package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Anonymize.kAnonymize]] — suppression semantics on hand groups and
  * the conservation laws on the real corpus. */
class AnonymizeSpec extends SparkTestBase {
  import spark.implicits._

  test("under-k groups suppress; exactly-k groups keep (hand data)") {
    val df = Seq(
      ("en", "a", 1L), ("en", "a", 2L), ("en", "a", 3L), // n=3 keeps
      ("en", "b", 4L), ("en", "b", 5L),                  // n=2 suppressed
      ("fr", "a", 6L))                                   // n=1 suppressed
      .toDF("lang", "source", "id").repartition(2)
    val (kept, receipt) = Anonymize.kAnonymize(df, Seq("lang", "source"),
      k = 3L)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 3L))
    val rec = receipt.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(rec(("en", "a")) === ((3L, false)))
    assert(rec(("en", "b")) === ((2L, true)))
    assert(rec(("fr", "a")) === ((1L, true)))
  }

  test("real corpus: kept count == sum of unsuppressed group sizes; " +
      "every kept row's group is at least k") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val (kept, receipt) = Anonymize.kAnonymize(docs,
      Seq("lang", "source"), k = 8L)
    val rec = receipt.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(kept.count() === rec.filterNot(_._4).map(_._3).sum)
    // receipt covers every observed combination exactly once
    assert(rec.length ===
      docs.select("lang", "source").distinct().count())
    // and the kept side has no under-k group
    val keptSizes = kept.groupBy("lang", "source").count()
      .collect().map(_.getLong(2))
    assert(keptSizes.forall(_ >= 8L))
  }

  test("invalid arguments rejected") {
    val df = Seq(("en", 1L)).toDF("lang", "id")
    intercept[IllegalArgumentException] {
      Anonymize.kAnonymize(df, Seq(), 3L)
    }
    intercept[IllegalArgumentException] {
      Anonymize.kAnonymize(df, Seq("lang"), 1L)
    }
  }
}
