package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[StreamingJoin.intervalJoin]] — the native stream-stream join:
  * stream == batch parity for the inner form, exactly-once null
  * emission for the outer form (only after the watermark proves no
  * match can arrive), and bounded join state under watermark eviction.
  */
class StreamingJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val Window = "5 minutes"
  private val Delay = "1 minute"

  private def toTs(df: DataFrame) =
    df.select(col("key"), timestamp_seconds(col("sec")).as("ts"),
      col("id"))

  /** Run both sides through the streaming join; returns (rows, final
    * state row count). Rows are (key, l_id, r_id Option). */
  private def run(name: String, leftOuter: Boolean,
                  batches: Seq[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])])
      : (Seq[(Long, Long, Option[Long])], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Long)]
    val rMem = MemoryStream[(Long, Long, Long)]
    val joined = StreamingJoin.intervalJoin(
      toTs(lMem.toDF().toDF("key", "sec", "id")),
      toTs(rMem.toDF().toDF("key", "sec", "id")),
      "key", Delay, Window, leftOuter)
    val q = joined.select(col("key"), col("id"), col("r_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { case (lb, rb) =>
        if (lb.nonEmpty) lMem.addData(lb: _*)
        if (rb.nonEmpty) rMem.addData(rb: _*)
        q.processAllAvailable()
      }
      val rows = spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSeq.sortBy(t => (t._1, t._2, t._3.getOrElse(-1L)))
      val state = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      (rows, state)
    } finally q.stop()
  }

  test("inner: stream == batch interval join when feeds are in order") {
    val lefts = Seq((1L, 1000L, 10L), (1L, 2000L, 11L), (2L, 1000L, 20L))
    val rights = Seq((1L, 1100L, 50L), // within 5 min of l10 only
      (1L, 2200L, 51L), // within of l11 (200s), NOT of l10 (1200s)
      (2L, 5000L, 52L)) // outside any window for key 2
    val (got, _) = run("ssj_inner", leftOuter = false,
      Seq((lefts, rights)))
    val batch = toTs(lefts.toDF("key", "sec", "id"))
      .join(toTs(rights.toDF("key", "sec", "id"))
          .select(col("key"), col("ts").as("r_ts"), col("id").as("r_id")),
        Seq("key"))
      .filter(col("r_ts") >= col("ts") &&
        col("r_ts") <= col("ts") + expr(s"interval $Window"))
      .select(col("key"), col("id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Some(r.getLong(2)): Option[Long]))
      .toSeq.sortBy(t => (t._1, t._2, t._3.getOrElse(-1L)))
    assert(got === batch)
    assert(got === Seq((1L, 10L, Some(50L)), (1L, 11L, Some(51L))))
  }

  test("left outer: the unmatched row's null emits only after the " +
      "watermark proves no match can arrive") {
    // batch 1: left rows at t=1000; a matching right for id 10 only
    val b1 = (Seq((1L, 1000L, 10L), (2L, 1000L, 20L)),
      Seq((1L, 1100L, 50L)))
    val (early, _) = run("ssj_outer_early", leftOuter = true, Seq(b1))
    // id 20 is unmatched but its window (until 1300) + delay (60) has
    // not been passed by any watermark — no null row yet
    assert(early === Seq((1L, 10L, Some(50L))))

    // batch 2 advances BOTH watermarks far past 1000+300+60
    val b2 = (Seq((9L, 100000L, 90L)), Seq((9L, 100000L, 91L)))
    val (late, _) = run("ssj_outer_late", leftOuter = true, Seq(b1, b2))
    assert(late.contains((2L, 20L, None)),
      s"unmatched left row never emitted its null: $late")
    assert(late.count(_._2 == 20L) === 1, "null row emitted more than once")
  }

  test("watermark evicts join state: buffered rows drop once the " +
      "window can no longer match") {
    val b1 = (Seq((1L, 1000L, 10L)), Seq((1L, 1100L, 50L)))
    val bigJump = (Seq((8L, 500000L, 80L)), Seq((8L, 500000L, 81L)))
    val again = (Seq((7L, 500001L, 70L)), Seq((7L, 500002L, 71L)))
    val (_, state) = run("ssj_state", leftOuter = false,
      Seq(b1, bigJump, again))
    // rows from t=1000 are long past eviction; only the recent rows
    // near t=500000 may remain buffered
    assert(state >= 0 && state <= 6,
      s"state not evicted: $state rows still buffered")
  }
}
