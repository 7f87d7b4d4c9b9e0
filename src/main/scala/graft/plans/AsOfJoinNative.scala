package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  AttributeSet,
  AttributeReference, CreateStruct, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.PlanBridge
import org.apache.spark.sql.types.{DateType, IntegerType, LongType,
  TimestampNTZType, TimestampType}

/** Native as-of join: the whole-operator form of the build brief's ladder
  * (c) — a custom logical plan, planner strategy, and physical operator,
  * self-registered via `spark.experimental` (and injectable through
  * [[graft.GraftExtensions]]).
  *
  * Semantics are IDENTICAL to [[graft.operators.AsOfJoin.asOf]] (the
  * union-tag-window composition): for each left row, attach the last right
  * row at-or-before it in (time, side, xxhash64(vals)) order within the
  * key, null-padding when none exists — including the positional null
  * edges (a null right time sorts earliest and acts as a t = −∞ fallback;
  * a null left time matches only such rows) and the deterministic
  * data-derived tie-break among right rows sharing (key, time).
  *
  * Why a custom operator when the window form already costs one shuffle
  * per side: the union form pads every shuffled row to the FULL combined
  * row width (left rows carry a null right-struct, right rows carry every
  * left column as null) and buffers each key group through a Window
  * operator. The native exec shuffles each side with only its own columns
  * and streams the merge with O(1) state per partition — fewer shuffled
  * bytes and no per-group buffering, which is the difference that matters
  * at 100 TB where the fact side dominates. Reference behavior analog:
  * the reference engine's point-in-time lookups resolve each reading
  * against the latest effective metadata
  * (lib/personalgreenbutton/src/lib.rs:32-190's link resolution).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightVals: Seq[Attribute],
    asOfOutput: Seq[Attribute],
    tolerance: Option[Long])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asOfOutput

  // asof_ columns are minted by this operator, not pulled from children
  override def producedAttributes: AttributeSet = AttributeSet(asOfOutput)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. Stateless — safe to
  * register once per session. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.rightVals, p.asOfOutput, p.tolerance) :: Nil
    case _ => Nil
  }
}

/** Partition-local streaming merge: both children hash-clustered on the
  * keys (EnsureRequirements co-partitions them and inserts the sorts), then
  * a single forward pass over each side per partition — O(left + right)
  * time, O(1) rows of state (the last at-or-before right row). The right
  * child's required ordering ends with xxhash64(struct(vals)) so ties among
  * right rows sharing (key, time) resolve to the same row the window form's
  * ordering picks, keeping the two implementations bit-identical.
  *
  * AQE note: CoalesceShufflePartitions applies one partition spec across a
  * stage's shuffles, so both children coalesce consistently (observed in
  * the plan-shape spec's final plan); if any rule ever broke the
  * co-partitioning, `zipPartitions` asserts equal partition counts and the
  * job FAILS — a wrong-plan here is loud, never silently wrong rows.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightVals: Seq[Attribute],
    asOfOutput: Seq[Attribute],
    tolerance: Option[Long])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asOfOutput

  override def producedAttributes: AttributeSet = AttributeSet(asOfOutput)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightKeys :+ rightTime).map(a => SortOrder(a, Ascending)) :+
      SortOrder(XxHash64(Seq(CreateStruct(tieVals)), 42L), Ascending))

  /** Tie-break hash input among right rows sharing (key, time) — MUST
    * mirror the window form exactly: plain asOf hashes struct(rightVals);
    * asOfTolerance routes through asOf with rightTime APPENDED to the
    * struct (it needs asof_<rightTime> for the freshness filter), so the
    * tolerance path's tie hash covers (rightVals :+ rightTime). Within a
    * tie group rightTime is constant, but the hash VALUE differs — a
    * rightVals-only hash can crown a different winner than the window
    * form on duplicate (key, time) rows. */
  private def tieVals: Seq[Attribute] =
    if (tolerance.isDefined &&
        !rightVals.exists(_.exprId == rightTime.exprId))
      rightVals :+ rightTime
    else rightVals

  // rows stream out in the left child's clustering/order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyAttrs = leftKeys
    val rKeyAttrs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val valAttrs = rightVals
    val outAttrs = output
    val asOfAttrs = asOfOutput
    val timeType = leftTime.dataType
    val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    require(lTimeIdx >= 0 && rTimeIdx >= 0,
      "as-of time columns must come from the respective child")
    val tolOpt = tolerance
    // resolved OUTSIDE the zipPartitions closure: calling an exec method
    // from inside would capture `this` (the whole physical subtree) into
    // every task closure, defeating the local-val copies above. Only the
    // tolerance path needs it, so non-integral time types stay legal for
    // the plain merge.
    val timeAsLong: (InternalRow, Int) => Long =
      if (tolOpt.isEmpty) null
      else timeType match {
        case LongType | TimestampType | TimestampNTZType =>
          (row, idx) => row.getLong(idx)
        case IntegerType | DateType => (row, idx) => row.getInt(idx).toLong
        case other => throw new IllegalArgumentException(
          s"asOfNative tolerance requires a long/int-backed time column, got $other")
      }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val valsProj = UnsafeProjection.create(valAttrs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ asOfAttrs)
      val nullVals = new GenericInternalRow(valAttrs.length)
      val joined = new JoinedRow

      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var buffered: InternalRow = null // copy of last at-or-before right row
      var bufferedKey: UnsafeRow = null

      // right row sorts at-or-before a left row at time lT? (right side
      // wins equal-time ties, null time = −∞ — the window form's ordering)
      def atOrBefore(r: InternalRow, lT: Any, lTNull: Boolean): Boolean = {
        if (r.isNullAt(rTimeIdx)) true
        else if (lTNull) false
        else timeOrd.compare(r.get(rTimeIdx, timeType), lT) <= 0
      }

      def withinTolerance(m: InternalRow, lRow: InternalRow,
                          lTNull: Boolean): Boolean = tolOpt match {
        case None => true
        case Some(tol) =>
          !lTNull && !m.isNullAt(rTimeIdx) &&
            timeAsLong(lRow, lTimeIdx) - timeAsLong(m, rTimeIdx) <= tol
      }

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTNull = lRow.isNullAt(lTimeIdx)
        val lT = if (lTNull) null else lRow.get(lTimeIdx, timeType)
        var advancing = true
        while (advancing && rHead != null) {
          val c = keyOrd.compare(rKeyProj(rHead), lKey)
          if (c < 0) {
            rHead = if (rIter.hasNext) rIter.next() else null
          } else if (c == 0 && atOrBefore(rHead, lT, lTNull)) {
            buffered = rHead.copy()
            bufferedKey = lKey.copy()
            rHead = if (rIter.hasNext) rIter.next() else null
          } else advancing = false
        }
        val matched =
          if (buffered != null && keyOrd.compare(bufferedKey, lKey) == 0 &&
              withinTolerance(buffered, lRow, lTNull)) buffered
          else null
        numOutputRows += 1
        outProj(joined(lRow,
          if (matched != null) valsProj(matched) else nullVals))
      }
    }
  }
}

/** DataFrame-level entry point for the native as-of join. */
object AsOfNative {

  /** Same contract as [[graft.operators.AsOfJoin.asOf]] (and, with
    * `tolerance`, [[graft.operators.AsOfJoin.asOfTolerance]]): every left
    * row survives, gaining `asof_<c>` for each requested right column —
    * null when no right row is at-or-before the left time (or the match is
    * staler than `tolerance`).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightVals: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    require(rightVals.nonEmpty, "asOfNative: rightVals must be non-empty")
    // the custom exec clusters children on the keys; ClusteredDistribution
    // rejects an empty clustering at planning with an opaque message —
    // fail here with the routing answer instead
    require(keys.nonEmpty, "asOfNative: keys must be non-empty — use " +
      "graft.operators.AsOfJoin.asOf (the window form) for a global as-of")
    // column-existence checks FIRST: the schema() accesses below throw
    // Spark's generic missing-field error, which would shadow these
    // friendlier messages
    val missingL = (keys :+ leftTime).filterNot(left.columns.contains)
    require(missingL.isEmpty, s"asOfNative: left side lacks column(s): $missingL")
    val missingR = ((keys :+ rightTime) ++ rightVals)
      .filterNot(right.columns.contains)
    require(missingR.isEmpty, s"asOfNative: right side lacks column(s): $missingR")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"asOfNative: time columns must share one type, got " +
        s"${left.schema(leftTime).dataType} vs ${right.schema(rightTime).dataType}" +
        " (the merge comparator is monomorphic — cast one side first)")
    // mismatched key types would hash the two sides DIFFERENTLY
    // (Murmur3 over int ≠ over long), landing matching keys in different
    // partitions, and keyOrd compares right projections with left-typed
    // ordering — silently missing/wrong matches, not the loud failure the
    // exec promises. Reject up front.
    keys.foreach { k =>
      val (lt, rt) = (left.schema(k).dataType, right.schema(k).dataType)
      require(lt == rt, s"asOfNative: key '$k' types must match, got " +
        s"$lt vs $rt (cast one side first)")
      // floating keys: the analyzer's NormalizeFloatingNumbers rule
      // rewrites known node types (Join/Aggregate/Window), never this
      // custom node — two NaN bit patterns would hash to different
      // partitions here while the window form matches them. Loud beats
      // silently-divergent; floating-point join identities are a smell
      // anyway.
      require(lt != org.apache.spark.sql.types.FloatType &&
          lt != org.apache.spark.sql.types.DoubleType,
        s"asOfNative: key '$k' is floating-point ($lt) — NaN/-0.0 " +
          "normalization does not reach custom plan nodes; cast the key " +
          "or use graft.operators.AsOfJoin.asOf")
    }
    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, AsOfJoinStrategy)
    val lPlan = PlanBridge.analyzed(left)
    // prune the right side to what the join consumes, and re-alias for
    // fresh exprIds so self-joins (both sides derived from one source — the
    // common case) carry no ambiguous references into the custom node
    val rCols = ((keys :+ rightTime) ++ rightVals).distinct
    val rPruned = PlanBridge.analyzed(right.select(rCols.map(col): _*))
    val aliases = rPruned.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rPruned)
    val rMap = aliases.map(al => al.name -> al.toAttribute).toMap
    val lMap = lPlan.output.map(a => a.name -> a).toMap
    val asOfAttrs = rightVals.map(c =>
      AttributeReference(s"asof_$c", rMap(c).dataType, nullable = true)())
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(lMap), keys.map(rMap), lMap(leftTime), rMap(rightTime),
      rightVals.map(rMap), asOfAttrs, tolerance)
    PlanBridge.ofRows(spark, node)
  }

  /** Hot-key-skew form of [[asOf]]: pre-partitions BOTH sides on
    * (keys, time-slice) with boundary handoff, so one pathological key (a
    * single meter with a billion readings — the shape AQE's skew splitting
    * cannot rewrite for Window or custom execs) spreads over
    * `span / sliceWidth` tasks instead of landing in one.
    *
    * Construction (all distributed, no driver loops):
    *  1. slice = floorDiv(time, sliceWidth); rows with a null time (the
    *     −∞ fallback rows) take a dedicated lowest slice.
    *  2. per (key, slice), the LAST right row under the as-of ordering
    *     (time asc nulls-first, then the same xxhash64 tie-break the exec
    *     sorts by) — one aggregated row per key-slice on the shuffle.
    *  3. the slice DOMAIN is every (key, slice) seen on either side; a
    *     running `last(...) ignoreNulls` window over slice order hands
    *     each slice the latest preceding last-row (the boundary handoff —
    *     a left slice with no in-slice right rows still matches). The
    *     window shuffles one row per key-slice, not per input row, so the
    *     hot key costs O(span/sliceWidth) in its window task.
    *  4. union carries into the sliced right side and run the native
    *     as-of with keys :+ slice — bit-identical semantics because every
    *     left row's true at-or-before match is either in its own slice or
    *     IS the carry row, and carry time < sliceStart ≤ left time keeps
    *     the merge ordering intact. Tolerance still gates inside the
    *     merge, so a carry staler than `tolerance` nulls out exactly as
    *     in the unsliced form.
    *
    * Cost: one extra shuffle per side (the domain distinct / the
    * per-slice aggregate) with key-slice-sized payloads — the opt-in
    * price of unbounded per-key parallelism. Choose `sliceWidth` so a hot
    * key's span covers ≫ 1 slice but a typical key's rows stay in few
    * slices. Requires an integral time column (cast timestamps to epoch
    * first). Reference semantics analog: the per-key sequential link
    * resolution of lib/personalgreenbutton/src/lib.rs:117-166.
    */
  def asOfSliced(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String, rightVals: Seq[String],
                 sliceWidth: Long, tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{coalesce, expr, last, lit,
      max_by, struct, when, xxhash64}
    require(sliceWidth > 0, "asOfSliced: sliceWidth must be positive")
    val tt = left.schema(leftTime).dataType
    require(tt == LongType || tt == IntegerType,
      s"asOfSliced: requires an integral time column, got $tt " +
        "(cast timestamps to epoch seconds/micros first)")

    val S = "__graft_slice"
    require(!left.columns.contains(S) && !right.columns.contains(S),
      s"asOfSliced: input already carries the reserved column $S")
    // exact integral floorDiv: (t - pmod(t, w)) is a multiple of w, so
    // `div` is exact — no double rounding on large epochs
    def withSlice(df: DataFrame, timeCol: String): DataFrame =
      df.withColumn(S,
        when(col(timeCol).isNull, lit(Long.MinValue)).otherwise(expr(
          s"(cast(`$timeCol` as bigint) - pmod(cast(`$timeCol` as bigint), " +
            s"${sliceWidth}L)) div ${sliceWidth}L")))

    val lS = withSlice(left, leftTime)
    val rCols = ((keys :+ rightTime) ++ rightVals).distinct
    val rS = withSlice(right.select(rCols.map(col): _*), rightTime)
    val rPayload = (rightTime +: rightVals).distinct

    // 2. last right row per (key, slice) under the exec's ordering
    val ord = struct(
      coalesce(col(rightTime).cast("long"), lit(Long.MinValue)),
      xxhash64(struct(rightVals.map(col): _*)))
    val lastPerSlice = rS.groupBy((keys :+ S).map(col): _*)
      .agg(max_by(struct(rPayload.map(col): _*), ord).as("__graft_last"))

    // 3. boundary handoff over the full slice domain. The right side's
    // (key, slice) set IS lastPerSlice's key set — deriving the domain
    // from it (instead of a third rS projection) saves a full right-side
    // scan, and its aggregation exchange is identical to the carry
    // join's, so ReuseExchange serves both from one shuffle.
    val domain = lS.select((keys :+ S).map(col): _*)
      .union(lastPerSlice.select((keys :+ S).map(col): _*)).distinct()
    val carryW = W.partitionBy(keys.map(col): _*).orderBy(col(S))
      .rowsBetween(W.unboundedPreceding, -1)
    // null-SAFE carry join: an equi-join (or USING) never matches null
    // keys, but the window form, the native merge, and the carry WINDOW
    // all treat a null key as one matching group — a plain join here
    // silently dropped cross-slice carries for null-keyed rows
    val dAl = domain.alias("__gd")
    val pAl = lastPerSlice.alias("__gp")
    val joinCond = (keys :+ S)
      .map(k => col(s"__gd.`$k`") <=> col(s"__gp.`$k`"))
      .reduce(_ && _)
    val carries = dAl.join(pAl, joinCond, "left")
      .select((keys :+ S).map(k => col(s"__gd.`$k`").as(k)) :+
        col("__gp.__graft_last").as("__graft_last"): _*)
      .withColumn("__graft_carry",
        last(col("__graft_last"), ignoreNulls = true).over(carryW))
      .filter(col("__graft_carry").isNotNull)
      .select((keys :+ S).map(col) ++
        rPayload.filterNot(keys.contains)
          .map(n => col(s"__graft_carry.`$n`").as(n)): _*)

    // 4. sliced native as-of; drop the plumbing column from the output.
    // distinct: a key appearing in rightVals must not duplicate a column
    // name (plain asOf dedupes the same way via rCols.distinct)
    val rAug = rS.select(((keys :+ S) ++ rPayload).distinct.map(col): _*)
      .unionByName(carries)
    asOf(lS, rAug, keys :+ S, leftTime, rightTime, rightVals, tolerance)
      .drop(S)
  }

  /** Auto-dispatching as-of: run the [[suggestSliceWidth]] diagnostics on
    * BOTH sides (the hot key can sit on either — a billion-reading meter on
    * the right, a billion-event user on the left) and route to [[asOfSliced]]
    * with the finer of the two suggested widths, or to the plain [[asOf]]
    * when neither side needs slicing. Returns the decision alongside the
    * frame so callers (and specs) can see which path ran.
    *
    * The diagnostics are ONE aggregation job per side at planning time —
    * the pipeline-author shape is "diagnose once per source, reuse the
    * width"; this form is for the operational default where the caller
    * doesn't want to think about skew at all. Non-integral time columns
    * always take the plain path (slicing needs integral arithmetic).
    */
  def asOfAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, rightVals: Seq[String],
               tolerance: Option[Long] = None,
               targetRowsPerSlice: Long = 4L * 1024 * 1024)
      : (DataFrame, Option[Long]) = {
    val tt = left.schema(leftTime).dataType
    val width: Option[Long] =
      if (tt != LongType && tt != IntegerType) None
      else {
        val lw = suggestSliceWidth(left, keys, leftTime, targetRowsPerSlice)
        val rw = suggestSliceWidth(right, keys, rightTime, targetRowsPerSlice)
        (lw, rw) match {
          case (None, None) => None
          // finer slices satisfy both sides' row-per-slice targets
          case _ => Some(math.min(lw.getOrElse(Long.MaxValue),
            rw.getOrElse(Long.MaxValue)))
        }
      }
    val out = width match {
      case Some(w) => asOfSliced(left, right, keys, leftTime, rightTime,
        rightVals, w, tolerance)
      case None => asOf(left, right, keys, leftTime, rightTime, rightVals,
        tolerance)
    }
    (out, width)
  }

  /** Skew diagnostics for [[asOfSliced]]: ONE aggregation pass over the
    * given side (partial-aggregated count/min/max per key, then a 1-row
    * TakeOrdered) finds the hottest key and proposes the slice width that
    * splits it into ~`targetRowsPerSlice`-row tasks. Returns None when no
    * key needs slicing (hottest key under target, or zero time span) —
    * the unsliced form is then the right plan, since slicing buys task
    * parallelism at the price of an extra key-slice shuffle per side.
    * Run it once on a sample or the planning pass, not per query. */
  def suggestSliceWidth(left: DataFrame, keys: Seq[String], timeCol: String,
                        targetRowsPerSlice: Long = 4L * 1024 * 1024)
      : Option[Long] = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    require(targetRowsPerSlice > 0, "targetRowsPerSlice must be positive")
    val hot = left
      .groupBy(keys.map(col): _*)
      .agg(count(col(timeCol)).as("_n"),
        min(col(timeCol).cast("long")).as("_lo"),
        max(col(timeCol).cast("long")).as("_hi"))
      .orderBy(col("_n").desc)
      .limit(1).collect()
    hot.headOption
      .filterNot(r => r.isNullAt(keys.length + 1) ||
        r.isNullAt(keys.length + 2)) // all-null times: nothing to slice
      .flatMap { r =>
        val n = r.getLong(keys.length)
        val span = r.getLong(keys.length + 2) - r.getLong(keys.length + 1)
        val slices = n / targetRowsPerSlice
        if (slices <= 1 || span <= 0) None
        else Some(math.max(1L, span / slices))
      }
  }
}
