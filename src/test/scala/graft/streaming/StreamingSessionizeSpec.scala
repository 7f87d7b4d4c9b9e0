package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private val Gap = "30 minutes" // 1800s — same as the batch sessionizers

  private def run(batches: Seq[Seq[(Long, Long)]], name: String,
                  delay: String = "10 seconds")
      : Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val in = mem.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val q = StreamingSessionize.sessions(in, Gap, delay)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
      spark.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
        .sortBy(t => (t._1, t._2))
    } finally q.stop()
  }

  test("closed sessions emit exactly once with last_event+gap end; " +
      "open sessions do NOT emit") {
    val got = run(Seq(
      Seq((1L, 1000L), (1L, 1100L), (2L, 1050L)),
      // watermark jumps past session ends; user 3 session stays OPEN
      Seq((3L, 100000L)),
      Seq((3L, 100010L))), "ssess_basic")
    assert(got == Seq(
      (1L, 1000L, 1100L + 1800L, 2L),
      (2L, 1050L, 1050L + 1800L, 1L)), got.toString)
  }

  test("an event exactly gap seconds after the previous EXTENDS the " +
      "session (merge-touching boundary, same rule as batch)") {
    val got = run(Seq(
      Seq((1L, 1000L), (1L, 2800L)),  // 2800 = 1000 + 1800: touches
      Seq((1L, 2801L + 1800L)),       // 4601 > 2800 + 1800: NEW session
      Seq((9L, 500000L)),
      Seq((9L, 500010L))), "ssess_touch")
    // first session spans both touching events; second closed by user 9
    assert(got == Seq(
      (1L, 1000L, 2800L + 1800L, 2L),
      (1L, 4601L, 4601L + 1800L, 1L)), got.toString)
  }

  test("bounded disorder within the watermark delay lands in event-time " +
      "position; streamed result == BATCH session_window on the same " +
      "events") {
    val batches = Seq(
      Seq((1L, 1000L), (1L, 1500L)),
      Seq((1L, 1400L)), // late; watermark = 1500-200 = 1300 ≤ 1400 ⇒ kept
      Seq((7L, 900000L)),
      Seq((7L, 900010L)))
    val got = run(batches, "ssess_late", delay = "200 seconds")
    val all = batches.flatten.toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val batch = all
      .groupBy(col("user_id"), session_window(col("ts"), Gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("s"),
        unix_timestamp(col("session_window.end")).as("e"),
        col("n_events"))
      .filter(col("user_id") === 1L) // user 7's session never closes
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(t => (t._1, t._2))
    assert(got == batch, s"stream $got != batch $batch")
    assert(got == Seq((1L, 1000L, 1500L + 1800L, 3L)), got.toString)
  }
}
