package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Data-quality gate at ingest: score each arriving micro-batch against a
  * static reference snapshot with [[graft.operators.Drift.psi]] and flag
  * features whose Population Stability Index crosses a threshold — the
  * "stop the pipeline, the new crawl looks different" alarm, evaluated
  * continuously instead of at release time.
  *
  * foreachBatch on purpose (same rationale as [[StreamingAnn]]): the
  * per-batch computation IS the batch operator, so the oracled
  * `d_drift_psi` value contract carries over verbatim, and the reference
  * frame can be a plain static DataFrame (re-broadcast per batch is the
  * aggregated histogram, a few hundred rows). Alert threshold defaults to
  * the conventional PSI 0.2 "investigate" line, in the operator's exact
  * integer 1e-9 units.
  */
object StreamingDrift {

  def monitor(changes: DataFrame, ref: DataFrame,
              features: Seq[(String, Column)],
              alertE9: Long = 200000000L,
              availableNow: Boolean = false)
             (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = changes.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(graft.operators.Drift.psi(ref, batch.toDF(), features)
          .withColumn("alert", col("psi_total_e9") > alertE9), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
