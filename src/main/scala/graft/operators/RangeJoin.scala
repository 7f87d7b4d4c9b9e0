package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point rows to interval rows
  * with `start <= point < end`. Spark's planner turns a bare inequality
  * join into BroadcastNestedLoopJoin (O(n·m)); the scalable composition is
  * the standard bucket trick: quantize time into fixed buckets, explode
  * each interval across the buckets it overlaps, equi-join on the bucket,
  * then refine with the exact predicate — one hash shuffle, candidates
  * bounded by bucket width.
  */
object RangeJoin {

  /** @param points      DataFrame with a numeric point column
    * @param intervals   DataFrame with numeric start/end columns (end exclusive)
    * @param pointCol    point column name
    * @param startCol    interval start column name
    * @param endCol      interval end column name
    * @param bucketWidth quantization width (same unit as the columns);
    *                    intervals explode into ~(len/width + 1) rows
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val pBucketed = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth))
    // upper bucket is floor(end/width), NOT floor((end-1)/width): the
    // latter assumes integer-granularity values and silently misses points
    // in (end-1, end) for fractional inputs (e.g. interval [1.0, 2.5),
    // point 2.3). The one-bucket overshoot when end sits exactly on a
    // boundary is removed by the exact predicate below.
    val iBucketed = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    pBucketed.join(iBucketed, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }

  /** Interval×interval OVERLAP join (end-exclusive: `aStart < bEnd AND
    * bStart < aEnd`), same grid trick — both sides explode across their
    * bucket span and equi-join on (keys, bucket). A pair that overlaps
    * across several buckets would match once per shared bucket; instead of
    * a `distinct` over the full output, each pair is emitted only in its
    * CANONICAL bucket — `max(floor(aStart/w), floor(bStart/w))`, the first
    * bucket both rows inhabit — so the join output is exactly-once by
    * construction and nothing re-shuffles for dedup. Column names must be
    * disjoint between the two sides (alias before calling).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val aB = a.withColumn("_bucket", explode(sequence(
      floor(col(aStart) / bucketWidth), floor(col(aEnd) / bucketWidth))))
    val bB = b.withColumn("_bucket", explode(sequence(
      floor(col(bStart) / bucketWidth), floor(col(bEnd) / bucketWidth))))
    aB.join(bB, keys :+ "_bucket")
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("_bucket") === greatest(
        floor(col(aStart) / bucketWidth), floor(col(bStart) / bucketWidth)))
      .drop("_bucket")
  }
}
