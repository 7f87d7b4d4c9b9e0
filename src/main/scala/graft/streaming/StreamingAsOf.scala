package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming as-of enrichment — the ONLINE feature-store lookup: a probe
  * stream (events needing features) is enriched per key with the latest
  * reference value at-or-before the probe's event time, among reference
  * rows that have ARRIVED so far.
  *
  * Semantics contract (the lambda-architecture split): this operator is
  * temporal-by-arrival — a probe matches the reference rows ingested
  * before it, exactly what a production feature store serves online; the
  * batch operator ([[graft.operators.AsOfJoin.asOf]]) is the
  * retrospective answer over ALL data regardless of arrival. When
  * reference rows arrive before the probes that need them (in-order
  * feeds), the two agree bit-for-bit — spec'd. A reference row arriving
  * AFTER a probe does not retroactively re-emit that probe (append
  * output); the batch backfill owns corrections.
  *
  * State: per key, a bounded buffer of the `maxBuffer` most-recent
  * reference rows (by event time) in RocksDB — O(maxBuffer) per ACTIVE
  * key, TTL-evictable. The buffer (not just the latest row) is what makes
  * the match exact under bounded reference-stream disorder: out-of-order
  * reference rows within the buffer horizon still land in event-time
  * position.
  */
object StreamingAsOf {

  /** Union-tagged input: `side` 0 = reference (carries `value`),
    * 1 = probe (carries `event_id`). */
  case class AsOfInput(user_id: Long, side: Int, ts: Long,
                       event_id: Long, value: Double)
  case class Enriched(event_id: Long, user_id: Long, ts: Long,
                      asof_value: Option[Double])

  class AsOfProcessor(maxBuffer: Int, ttl: TTLConfig)
      extends StatefulProcessor[Long, AsOfInput, Enriched] {
    @transient private var refs: ListState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      refs = getHandle.getListState[(Long, Double)]("refs",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), ttl)

    override def handleInputRows(key: Long, rows: Iterator[AsOfInput],
        timers: TimerValues): Iterator[Enriched] = {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Double)] ++= refs.get()
      // reference rows first: within a micro-batch, updates become
      // visible to that batch's probes (mirrors batch-join semantics
      // where co-batched rows see each other)
      val (refRows, probeRows) = rows.toSeq.partition(_.side == 0)
      var dirty = false
      refRows.foreach { r =>
        buf += ((r.ts, r.value))
        dirty = true
      }
      if (dirty || buf.length > maxBuffer) {
        val kept = buf.sortBy(_._1).takeRight(maxBuffer)
        buf.clear()
        buf ++= kept
        refs.clear()
        kept.foreach(refs.appendValue)
      }
      probeRows.sortBy(_.ts).iterator.map { p =>
        // last reference at-or-before the probe time (buffer is sorted)
        val m = buf.view.takeWhile(_._1 <= p.ts).lastOption
        Enriched(p.event_id, p.user_id, p.ts, m.map(_._2))
      }
    }
  }

  /** @param input union-tagged stream (see [[AsOfInput]])
    * @param maxBuffer reference rows retained per key (disorder horizon)
    * @param ttl idle-key eviction (ProcessingTime mode when set)
    */
  def asOfEnrich(input: Dataset[AsOfInput], maxBuffer: Int = 64,
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[Enriched] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.user_id)
      .transformWithState(new AsOfProcessor(maxBuffer, ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None()
        else TimeMode.ProcessingTime(),
        OutputMode.Append(), Encoders.product[Enriched])
  }
}
