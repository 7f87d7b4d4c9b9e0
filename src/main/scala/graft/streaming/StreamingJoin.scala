package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NATIVE watermarked stream-stream interval join — attribution /
  * enrichment between two live feeds (views ⋈ clicks, requests ⋈
  * responses) with Spark's built-in symmetric hash join, not custom
  * state: both sides watermark their event time, the join condition
  * bounds the match window, and the state store evicts a buffered row
  * as soon as the other side's watermark passes its last possible
  * match — state is O(rows in flight within the window), independent
  * of stream length. This is the compose-existing-ops counterpart to
  * [[StreamingAsOf]] (which needs custom `transformWithState` because
  * "latest at-or-before, unbounded lookback" has no eviction bound a
  * native join could enforce).
  *
  * Semantics: left row l matches right rows r with `l.key = r.key AND
  * r.ts ∈ [l.ts, l.ts + window]` — the stream twin of
  * [[graft.operators.RangeJoin]]'s point-in-interval shape. With
  * `leftOuter = true`, an unmatched left row emits exactly once with
  * nulls — only after the right watermark proves no match can still
  * arrive (the null row is a STATEMENT about completed time, which is
  * why the join type requires the time bound at all).
  *
  * Columns: left must carry (`key`, `ts` TIMESTAMP, payload…), right
  * likewise; output prefixes right columns with `r_`.
  */
object StreamingJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   delay: String, window: String,
                   leftOuter: Boolean = false): DataFrame = {
    val l = left.withWatermark("ts", delay)
    val r0 = right.withWatermark("ts", delay)
    val r = r0.select(r0.columns.map(c => col(c).as(s"r_$c"))
      .toIndexedSeq: _*)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col("r_ts") >= col("ts") &&
        col("r_ts") <= col("ts") + expr(s"interval $window"),
      if (leftOuter) "left_outer" else "inner")
      .drop(s"r_$key")
  }
}
