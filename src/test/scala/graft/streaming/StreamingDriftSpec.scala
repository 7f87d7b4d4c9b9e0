package graft.streaming

import graft.SparkTestBase
import graft.operators.Drift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDriftSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch PSI == batch Drift.psi against the same reference; " +
      "alert fires only on the drifted batch") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq.fill(8)("a").zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(2)
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Map[Long, DataFrame]()
    val q = StreamingDrift.monitor(mem.toDF().toDF("id", "v"), ref,
        Seq("v" -> col("v"))) { (df, id) =>
      seen.synchronized { seen(id) = df.cache() }
    }
    try {
      // batch 0: same distribution as ref; batch 1: fully drifted
      mem.addData((100L, "a"), (101L, "a"))
      q.processAllAvailable()
      mem.addData((200L, "z"), (201L, "z"), (202L, "z"))
      q.processAllAvailable()
      val b0 = seen(0L).orderBy("bucket").collect()
      assert(b0.map(_.getAs[Long]("psi_e9")).forall(_ == 0L))
      assert(b0.forall(!_.getAs[Boolean]("alert")))
      val b1 = seen(1L).orderBy("bucket").collect()
      assert(b1.forall(_.getAs[Boolean]("alert")))
      // value parity with the batch operator on the identical input
      val want = Drift.psi(ref,
          Seq((200L, "z"), (201L, "z"), (202L, "z")).toDF("id", "v"),
          Seq("v" -> col("v")))
        .orderBy("bucket").collect()
        .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_ref"),
          r.getAs[Long]("n_cur"), r.getAs[Long]("psi_e9"))).toSeq
      val got = b1.map(r => (r.getAs[String]("bucket"),
        r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
        r.getAs[Long]("psi_e9"))).toSeq
      assert(got == want, s"stream/batch divergence: $got vs $want")
    } finally q.stop()
  }
}
