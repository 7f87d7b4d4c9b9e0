package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingAnonymize.admit]] — quorum withholding, whole-group flush
  * on the k-th member, pass-through after promotion, exactly-once
  * emission, and eventual parity with batch suppression. */
class StreamingAnonymizeSpec extends SparkTestBase {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = scala.util.Try(spark.conf.get(key)).toOption
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def run(batches: Seq[Seq[(String, String, Long)]], k: Long)
      : Seq[Vector[Long]] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
    val admitted = StreamingAnonymize.admit(
      mem.toDF().toDF("lang", "source", "id"),
      Seq("lang", "source"), "id", "lang", k)
    val q = admitted.writeStream.outputMode("append")
      .format("memory").queryName("kanon_out").start()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        out += spark.table("kanon_out").select("id")
          .collect().map(_.getLong(0)).toVector.sorted
      }
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS kanon_out")
    out.toSeq
  }

  test("k-th member flushes the whole held group; later members pass " +
      "through; under-quorum groups never emit") {
    val cumulative = run(Seq(
      Seq(("en", "a", 1L), ("en", "a", 2L)),   // held (k=3)
      Seq(("fr", "b", 10L)),                   // held forever
      Seq(("en", "a", 3L)),                    // quorum -> flush 1,2,3
      Seq(("en", "a", 4L))),                   // promoted -> immediate
      k = 3L)
    assert(cumulative(0) === Vector())
    assert(cumulative(1) === Vector())
    assert(cumulative(2) === Vector(1L, 2L, 3L))
    assert(cumulative(3) === Vector(1L, 2L, 3L, 4L))
  }

  test("exactly-once: no id is emitted twice across batches") {
    val cumulative = run(Seq(
      Seq(("en", "a", 1L), ("en", "a", 2L), ("en", "a", 3L)),
      Seq(("en", "a", 4L), ("en", "a", 5L))), k = 2L)
    assert(cumulative.last.distinct === cumulative.last)
    assert(cumulative.last === Vector(1L, 2L, 3L, 4L, 5L))
  }

  test("eventual parity: emitted set == batch kAnonymize kept set over " +
      "the full prefix (real corpus slice)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val k = 4L
    val got = run(docs.grouped(40).toSeq, k).last.toSet
    val (kept, _) = graft.operators.Anonymize.kAnonymize(
      graft.Tables.load(spark, sfDir, "documents"),
      Seq("lang", "source"), k)
    val want = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
