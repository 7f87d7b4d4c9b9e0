package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key (the time-series point-in-
  * time join Spark lacks natively).
  *
  * Spark-first composition (preference (a) of the build brief — no custom
  * SparkPlan needed): union both sides tagged by origin, sort within key by
  * (time, side-order), and propagate the last right row with a running
  * `last(..., ignoreNulls)` window. Cost: ONE shuffle on the key — the same
  * as the sort-merge join a dedicated physical operator would do, so a
  * custom strategy would buy nothing at scale.
  */
object AsOfJoin {

  /** @param left      probe side; columns preserved
    * @param right     reference side
    * @param keys      equi-key columns present on both sides
    * @param leftTime  event-time column name on left
    * @param rightTime event-time column name on right
    * @param rightVals right columns to attach (null when no row is ≤ time)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // All rightVals travel in ONE struct that is non-null exactly for right
    // rows: a single last(_r, ignoreNulls) then attaches every column from
    // the SAME matched right row, and a genuine NULL inside a matched row's
    // rightVal survives (a per-column last() would skip it and mix rows).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    // tag: right rows sort before left rows at equal timestamps, so a right
    // row AT the probe time is visible to it (<= semantics)
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(rStructType).as("_r"): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        struct(rightVals.map(col): _*).as("_r"): _*)

    // _tie: without it, two right rows sharing (key, time) sort equal and
    // last() attaches whichever the shuffle ordered later — nondeterminism
    // across runs. xxhash64 of the value struct is data-derived, so the
    // pick is stable run-to-run (and identical duplicates tie harmlessly).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), xxhash64(col("_r")))
      .rowsBetween(Window.unboundedPreceding, 0)

    val withAsOf = taggedLeft.unionByName(taggedRight)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))

    withAsOf.filter(col("_side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) ++
        rightVals.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }

  /** As-of join with a maximum-staleness tolerance: like [[asOf]], but the
    * match is dropped (nulled) when the matched right row is older than
    * `tolerance` (in the same units as the two time columns) relative to
    * the left time — the bounded-staleness point-in-time join (sensor
    * fusion, market-data enrichment). Same ONE shuffle as [[asOf]]; the
    * tolerance is a post-window per-row filter, so no extra pass over the
    * data.
    */
  def asOfTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    rightVals: Seq[String], tolerance: Long): DataFrame = {
    val vals = if (rightVals.contains(rightTime)) rightVals
               else rightVals :+ rightTime
    // materialize the flag BEFORE nulling any asof_ column (one of them may
    // be the right-time column itself)
    val joined = asOf(left, right, keys, leftTime, rightTime, vals)
      .withColumn("_fresh",
        col(s"asof_$rightTime") >= col(leftTime) - lit(tolerance))
    val filtered = rightVals.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(col("_fresh"), col(s"asof_$c")))
    }.drop("_fresh")
    if (rightVals.contains(rightTime)) filtered
    else filtered.drop(s"asof_$rightTime")
  }

  /** Nearest-direction as-of: each left row picks the right row minimizing
    * |rightTime − leftTime|, looking BOTH ways (pandas
    * `merge_asof(direction='nearest')`). Ties (equidistant past/future)
    * break toward the PAST row — fully deterministic when the time key is
    * unique per side (use a packed key).
    *
    * Same union-tag-window composition as [[asOf]], with BOTH directions
    * from one sort: a running `last(_r, ignoreNulls)` over
    * (unboundedPreceding, current) gives the at-or-before match and a
    * running `first(_r, ignoreNulls)` over (current, unboundedFollowing)
    * the strictly-after one — ONE shuffle on the key, both window frames
    * reuse the same partitioning+sort, and every left row survives (a
    * join-back composition of two asOf passes would cost four exchanges
    * and, being an inner equi-join on the time column, silently drop left
    * rows with NULL time instead of null-padding them).
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightVals: Seq[String]): DataFrame = {
    val vals = if (rightVals.contains(rightTime)) rightVals
               else rightVals :+ rightTime
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      vals.map(c => right.schema(c).copy(name = c)))
    val taggedLeft = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(rStructType).as("_r"): _*)
    val taggedRight = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        struct(vals.map(col): _*).as("_r"): _*)

    // right rows sort before left at equal time (_side 0 < 1), so an
    // exact-time match lands in the BACKWARD frame — and wins the tie by
    // distance 0 anyway
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), xxhash64(col("_r")))
    val backW = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwdW = w.rowsBetween(0, Window.unboundedFollowing)

    val withBoth = taggedLeft.unionByName(taggedRight)
      .withColumn("_back", last(col("_r"), ignoreNulls = true).over(backW))
      .withColumn("_fwd", first(col("_r"), ignoreNulls = true).over(fwdW))
      .filter(col("_side") === 1)

    val lt = col(leftTime)
    val bt = col("_back").getField(rightTime)
    val ft = col("_fwd").getField(rightTime)
    // closer wins; equal distance or missing-forward → backward. A NULL
    // left time has no distance to either side — null-pad (the outer when):
    // without the gate, NULLs sort first so _back is null and pickBack
    // evaluates false, fabricating the earliest right row as a "match".
    val pickBack = ft.isNull || (bt.isNotNull && (lt - bt) <= (ft - lt))
    val picked = withBoth
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) :+
        col("_back").as("_back") :+ col("_fwd").as("_fwd"): _*)
      .withColumn("_pick", when(lt.isNotNull,
        when(pickBack, col("_back")).otherwise(col("_fwd"))))
    val out = picked
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightVals.map(c => col("_pick").getField(c).as(s"asof_$c")): _*)
    out
  }
}
