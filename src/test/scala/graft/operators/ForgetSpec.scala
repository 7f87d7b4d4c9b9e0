package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ForgetSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "keep"), (2L, "drop"), (3L, "keep"), (4L, "drop"))
    .toDF("doc_id", "text")
  private val chunks = Seq(
    (1L, 0), (2L, 0), (2L, 1), (3L, 0), (4L, 0), (4L, 1), (4L, 2))
    .toDF("doc_id", "chunk_id")
  private val dels = Seq(2L, 4L, 99L).toDF("doc_id") // 99: not present

  test("clean removes exactly the listed ids; absent ids are no-ops; " +
      "idempotent") {
    val c1 = Forget.clean(docs, "doc_id", dels)
    assert(c1.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
    val c2 = Forget.clean(c1, "doc_id", dels)
    assert(c2.collect().toSet == c1.collect().toSet, "not idempotent")
  }

  test("manifest counts per artifact (ids not in the artifact count 0)") {
    val m = Forget.manifest(dels, Seq(
        ("documents", docs, "doc_id"),
        ("chunks", chunks, "doc_id")))
      .orderBy("artifact").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(m == Seq(
      ("chunks", 7L, 5L, 2L),
      ("documents", 4L, 2L, 2L)), m.toString)
  }

  test("manifest n_after equals clean() count for every artifact") {
    val m = Forget.manifest(dels, Seq(("chunks", chunks, "doc_id")))
      .collect()(0)
    assert(m.getLong(3) == Forget.clean(chunks, "doc_id", dels).count())
  }

  test("duplicate ids in the deletion list do not double-count") {
    val m = Forget.manifest(dels.union(dels),
      Seq(("documents", docs, "doc_id"))).collect()(0)
    assert((m.getLong(1), m.getLong(2), m.getLong(3)) == ((4L, 2L, 2L)))
  }

  test("empty artifact list and reserved column names fail fast") {
    val e1 = intercept[IllegalArgumentException](
      Forget.manifest(dels, Seq.empty))
    assert(e1.getMessage.contains("at least one artifact"))
    val poisoned = docs.withColumn("_forget_id", col("doc_id"))
    val e2 = intercept[IllegalArgumentException](
      Forget.clean(poisoned, "doc_id", dels))
    assert(e2.getMessage.contains("_forget_id"))
    val e3 = intercept[IllegalArgumentException](
      Forget.manifest(dels,
        Seq(("bad", docs.withColumn("_del", lit(1)), "doc_id"))))
    assert(e3.getMessage.contains("_del"))
  }
}
