package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamingAsOf.{AsOfInput, Enriched}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util

class StreamingAsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = util.Try(spark.conf.get(key)).toOption
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def ref(u: Long, ts: Long, v: Double) = AsOfInput(u, 0, ts, -1L, v)
  private def probe(u: Long, id: Long, ts: Long) = AsOfInput(u, 1, ts, id, 0.0)

  test("in-order feeds match the BATCH as-of bit-for-bit (the lambda " +
      "contract: online == retrospective when arrival respects time)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[AsOfInput]
      val q = StreamingAsOf.asOfEnrich(mem.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("sasof_out").start()
      try {
        mem.addData(ref(1, 10, 1.0), ref(1, 20, 2.0), ref(2, 5, 9.0))
        q.processAllAvailable()
        mem.addData(probe(1, 100, 15), probe(1, 101, 25), probe(1, 102, 5),
          probe(2, 103, 6), probe(3, 104, 50))
        q.processAllAvailable()
        val got = spark.sql("SELECT * FROM sasof_out").as[Enriched]
          .collect().map(e => e.event_id -> e.asof_value).toMap

        // batch reference on the same data
        val refs = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 5L, 9.0))
          .toDF("user_id", "ts", "value")
        val probes = Seq((1L, 100L, 15L), (1L, 101L, 25L), (1L, 102L, 5L),
          (2L, 103L, 6L), (3L, 104L, 50L))
          .toDF("user_id", "event_id", "ts")
        val batch = graft.operators.AsOfJoin.asOf(probes, refs,
            Seq("user_id"), "ts", "ts", Seq("value"))
          .collect().map(r => r.getAs[Long]("event_id") ->
            Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble))
          .toMap
        assert(got == batch, s"stream $got != batch $batch")
        assert(got(100L) == Some(1.0) && got(101L) == Some(2.0) &&
          got(102L) == None && got(103L) == Some(9.0) && got(104L) == None)
      } finally q.stop()
    }
  }

  test("same-batch reference rows are visible to that batch's probes, and " +
      "a LATE reference does not retroactively re-emit served probes") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[AsOfInput]
      val q = StreamingAsOf.asOfEnrich(mem.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("sasof_late").start()
      try {
        // co-batched ref+probe: probe sees the ref
        mem.addData(ref(7, 10, 5.0), probe(7, 200, 12))
        q.processAllAvailable()
        // late ref BELOW the served probe's time: arrives after serving
        mem.addData(ref(7, 11, 6.0))
        q.processAllAvailable()
        val rows = spark.sql("SELECT * FROM sasof_late").as[Enriched].collect()
        assert(rows.length == 1) // no retroactive correction (append)
        assert(rows.head.event_id == 200L && rows.head.asof_value == Some(5.0))
        // but the late ref serves FUTURE probes
        mem.addData(probe(7, 201, 12))
        q.processAllAvailable()
        val after = spark.sql("SELECT * FROM sasof_late").as[Enriched]
          .collect().map(e => e.event_id -> e.asof_value).toMap
        assert(after(201L) == Some(6.0))
      } finally q.stop()
    }
  }

  test("out-of-order reference arrival WITHIN the buffer lands in " +
      "event-time position; the buffer cap keeps the most recent rows") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[AsOfInput]
      val q = StreamingAsOf.asOfEnrich(mem.toDS(), maxBuffer = 3)
        .writeStream.outputMode("append")
        .format("memory").queryName("sasof_ooo").start()
      try {
        // refs arrive out of event-time order: 30, then 10 and 20
        mem.addData(ref(5, 30, 3.0))
        q.processAllAvailable()
        mem.addData(ref(5, 10, 1.0), ref(5, 20, 2.0))
        q.processAllAvailable()
        mem.addData(probe(5, 300, 25)) // should match ts=20, not ts=30
        q.processAllAvailable()
        // cap eviction: adding ts=40 pushes out the OLDEST (ts=10)
        mem.addData(ref(5, 40, 4.0))
        q.processAllAvailable()
        mem.addData(probe(5, 301, 15)) // ts=10 evicted → no match ≤ 15
        q.processAllAvailable()
        val got = spark.sql("SELECT * FROM sasof_ooo").as[Enriched]
          .collect().map(e => e.event_id -> e.asof_value).toMap
        assert(got(300L) == Some(2.0), s"got $got")
        assert(got(301L) == None, s"eviction horizon violated: $got")
      } finally q.stop()
    }
  }
}
