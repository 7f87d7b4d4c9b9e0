package graft.plans

import graft.SparkTestBase
import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native as-of operator must be bit-identical to the union-window
  * composition it accelerates — every test drives BOTH and compares. */
class AsOfNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def leftFixture = Seq(
    ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 5L, "c"),
    ("u2", 100L, "d"), // key with no right rows at all
    ("u3", 7L, "e"),   // match exactly at the boundary time
    ("u4", 1L, "f")    // right rows exist but all later
  ).toDF("k", "t", "payload").repartition(2)

  private def rightFixture = Seq(
    ("u1", 8L, 1.0), ("u1", 10L, 2.0), ("u1", 15L, 3.0),
    ("u3", 7L, 4.0),
    ("u4", 9L, 5.0)
  ).toDF("k", "t", "v").repartition(2)

  test("parity with the window form on the fixture (matches, boundary, " +
      "no-match key, all-later key)") {
    val window = AsOfJoin.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    val native = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(native) == sortedRows(window))
    // spot semantics: u1@20 → 15/3.0, u3@7 → boundary match 4.0, u4 → null
    val m = native.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> Option(r.get(3))).toMap
    assert(m(("u1", 20L)) == Some(3.0))
    assert(m(("u3", 7L)) == Some(4.0))
    assert(m(("u4", 1L)) == None)
    assert(m(("u2", 100L)) == None)
  }

  test("parity on null edges: null left time, null right time") {
    val l = Seq(("a", Some(10L), "x"), ("a", None, "y"), ("b", None, "z"))
      .toDF("k", "t", "payload").repartition(2)
    val r = Seq(("a", Some(5L), 1.0), ("a", None, 9.0), ("c", Some(1L), 7.0))
      .toDF("k", "t", "v").repartition(2)
    val window = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    val native = AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("parity on right-side ties (same key and time): the data-derived " +
      "tie-break picks the same row as the window ordering") {
    val l = Seq(("a", 10L, "x")).toDF("k", "t", "payload").repartition(2)
    val r = Seq(("a", 10L, 1.0), ("a", 10L, 2.0), ("a", 10L, 3.0))
      .toDF("k", "t", "v").repartition(2)
    val window = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    val native = AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("tolerance parity with asOfTolerance (stale matches nulled)") {
    val window = AsOfJoin.asOfTolerance(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"), tolerance = 3L)
    val native = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"), tolerance = Some(3L))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("parity on sf0.001 events (both sides derived from one source — " +
      "the self-join exprId path)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "value")
    // both projected to one explicit column order: the window form emits
    // keys first, the native form keeps left.output order — same values
    val cols = Seq("event_id", "user_id", "ts", "asof_value")
    val window = AsOfJoin.asOf(purchases, errors,
      Seq("user_id"), "ts", "ts", Seq("value"))
      .select(cols.map(col): _*)
    val native = AsOfNative.asOf(purchases, errors,
      Seq("user_id"), "ts", "ts", Seq("value"))
      .select(cols.map(col): _*)
    assert(native.count() == purchases.count()) // every left row survives
    assert(sortedRows(native) == sortedRows(window))
  }

  test("asOfSliced parity: fixture incl. empty slices between right rows " +
      "(the boundary handoff), null edges, ties, and tolerance") {
    // sliceWidth 4 puts u1's left rows across slices {1, 2, 5} with right
    // rows only in slices {2, 3} — u1@20 (slice 5) must match via carry
    val wide = leftFixture.union(Seq(("u1", 23L, "g")).toDF("k", "t", "payload"))
    for (tol <- Seq(None, Some(3L))) {
      val unsliced = AsOfNative.asOf(wide, rightFixture,
        Seq("k"), "t", "t", Seq("v"), tol)
      val sliced = AsOfNative.asOfSliced(wide, rightFixture,
        Seq("k"), "t", "t", Seq("v"), sliceWidth = 4L, tolerance = tol)
      assert(sliced.columns.toSeq == unsliced.columns.toSeq)
      assert(sortedRows(sliced) == sortedRows(unsliced), s"tol=$tol")
    }
    // null edges: null left times match only null-time right rows; a
    // null-time right row is the −∞ fallback and must CARRY across slices
    val l = Seq(("a", Some(10L), "x"), ("a", None, "y"), ("b", None, "z"),
      ("a", Some(2L), "w")).toDF("k", "t", "payload").repartition(2)
    val r = Seq(("a", Some(5L), 1.0), ("a", None, 9.0), ("c", Some(1L), 7.0))
      .toDF("k", "t", "v").repartition(2)
    assert(sortedRows(AsOfNative.asOfSliced(l, r, Seq("k"), "t", "t", Seq("v"), 4L))
      == sortedRows(AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))))
    // right-side ties share a slice, so the xxhash64 tie-break is preserved
    val lt = Seq(("a", 10L, "x")).toDF("k", "t", "payload").repartition(2)
    val rt = Seq(("a", 10L, 1.0), ("a", 10L, 2.0), ("a", 10L, 3.0))
      .toDF("k", "t", "v").repartition(2)
    assert(sortedRows(AsOfNative.asOfSliced(lt, rt, Seq("k"), "t", "t", Seq("v"), 4L))
      == sortedRows(AsOfNative.asOf(lt, rt, Seq("k"), "t", "t", Seq("v"))))
  }

  test("asOfSliced: one pathological hot key lands in MULTIPLE tasks, " +
      "bit-identical to the unsliced form (the 100TB skew shape)") {
    // 100k readings on one meter vs a handful on others — unsliced, the
    // hot key is one task by construction (hash on the key alone)
    val hotLeft = spark.range(100000).select(lit("hot").as("k"),
      (col("id") * 10L).as("t"), col("id").as("payload"))
    val left = hotLeft.unionByName(
      Seq(("cold1", 5L, -1L), ("cold2", 7L, -2L)).toDF("k", "t", "payload"))
      .repartition(8)
    val right = spark.range(500).select(lit("hot").as("k"),
      (col("id") * 1000L).as("t"), (col("id") + lit(0.5)).as("v"))
      .unionByName(Seq(("cold1", 1L, 9.9)).toDF("k", "t", "v"))
      .repartition(8)
    val unsliced = AsOfNative.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
    val sliced = AsOfNative.asOfSliced(left, right, Seq("k"), "t", "t",
      Seq("v"), sliceWidth = 100000L) // hot span 10^6 → 10 slices
    assert(sortedRows(sliced) == sortedRows(unsliced))
    // the executed sliced plan hashes on (key, slice): the hot key's rows
    // must arrive in >1 task (rdd partitions mirror the exec's partitions —
    // the projection/filter above the exec is narrow). AQE's partition
    // coalescing is pinned OFF here: at this toy size it would legally fold
    // the whole 10-slice shuffle back into one partition, which is exactly
    // what CANNOT happen at the 100TB shape the slicing exists for.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val hotPerPart = sliced.filter(col("k") === "hot").rdd
        .mapPartitions(it => Iterator(it.size), preservesPartitioning = true)
        .collect()
      assert(hotPerPart.count(_ > 0) > 1,
        s"hot key still single-task: ${hotPerPart.mkString(",")}")
      // and the unsliced form, for contrast, concentrates it in exactly one
      val unslicedPerPart = unsliced.filter(col("k") === "hot").rdd
        .mapPartitions(it => Iterator(it.size), preservesPartitioning = true)
        .collect()
      assert(unslicedPerPart.count(_ > 0) == 1)
    } finally prev match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  test("asOfSliced A/B under real skew: measured wall-clock, sliced " +
      "engages every core while unsliced serializes on the hot key") {
    // 2M-row hot key (one meter's readings), local[8]: unsliced merges the
    // whole key in ONE task; sliced spreads it over span/sliceWidth tasks.
    // The numbers land in SCALE.md — this spec records them (info) and
    // asserts only the robust directional facts, not a timing ratio.
    val hot = spark.range(2000000).select(lit("hot").as("k"),
      (col("id") * 10L).as("t"), col("id").as("payload"))
      .repartition(8).localCheckpoint(true) // isolate input build from timing
    val right = spark.range(2000).select(lit("hot").as("k"),
      (col("id") * 10000L).as("t"), (col("id") + lit(0.5)).as("v"))
      .repartition(4).localCheckpoint(true)
    def time(df: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nU, sU) = time(AsOfNative.asOf(hot, right, Seq("k"), "t", "t", Seq("v")))
    val (nS, sS) = time(AsOfNative.asOfSliced(hot, right, Seq("k"), "t", "t",
      Seq("v"), sliceWidth = 2500000L)) // 20M span → 8 slices
    info(f"2M-row hot key, local[8]: unsliced $sU%.2f s, sliced $sS%.2f s " +
      f"(8 slices)")
    assert(nU == 2000000L && nS == 2000000L)
    // generous bound: slicing must not collapse under skew (it may win or
    // lose modestly at this toy scale; the 100TB argument is task count)
    assert(sS < sU * 3, f"sliced pathologically slow: $sS%.2f vs $sU%.2f")
  }

  test("suggestSliceWidth: proposes a width that splits the hottest key " +
      "to target-size tasks; says None when nothing needs slicing") {
    val skewed = spark.range(100000).select(lit("hot").as("k"),
      (col("id") * 10L).as("t"))
      .unionByName(Seq(("cold", 5L)).toDF("k", "t"))
    // hot key: 100k rows over span ~10^6; target 10k rows/slice → 10
    // slices → width ≈ span/10
    val w = AsOfNative.suggestSliceWidth(skewed, Seq("k"), "t",
      targetRowsPerSlice = 10000L)
    assert(w.isDefined && w.get > 0)
    assert(math.abs(w.get - 99999L) <= 10, s"width off: $w")
    // the suggestion actually spreads the key: floorDiv span into ~10 ids
    val slices = 999990L / w.get + 1
    assert(slices >= 9 && slices <= 11, s"slices=$slices")
    // uniform data under target: no slicing recommended
    assert(AsOfNative.suggestSliceWidth(skewed, Seq("k"), "t",
      targetRowsPerSlice = 1000000L).isEmpty)
    // all-null times: nothing to slice, no NPE
    val nulls = Seq(("a", Option.empty[java.lang.Long]),
      ("a", Option.empty[java.lang.Long])).toDF("k", "t")
    assert(AsOfNative.suggestSliceWidth(nulls, Seq("k"), "t", 1L).isEmpty)
  }

  test("asOfAuto routes hot-key inputs to the sliced path and uniform " +
      "inputs to the plain path, bit-identical either way") {
    // hot RIGHT side: one key with 50k rows over a wide span — the sliced
    // path must trigger off the right-side diagnostics alone
    val hotRight = spark.range(50000).select(lit("hot").as("k"),
      (col("id") * 10L).as("t"), (col("id") % 97).cast("double").as("v"))
    val coldLeft = Seq(("hot", 250001L, "a"), ("hot", 10L, "b"),
      ("cold", 5L, "c")).toDF("k", "t", "payload").repartition(2)
    val (auto, width) = AsOfNative.asOfAuto(coldLeft, hotRight, Seq("k"),
      "t", "t", Seq("v"), targetRowsPerSlice = 5000L)
    assert(width.isDefined, "hot right side must trigger slicing")
    assert(sortedRows(auto) == sortedRows(
      AsOfNative.asOf(coldLeft, hotRight, Seq("k"), "t", "t", Seq("v"))))
    // hot on BOTH sides: the finer width (here the left's — more rows over
    // the same span) wins
    val hotLeft = spark.range(100000).select(lit("hot").as("k"),
      (col("id") * 5L).as("t"), lit("p").as("payload"))
    val (_, wBoth) = AsOfNative.asOfAuto(hotLeft, hotRight, Seq("k"),
      "t", "t", Seq("v"), targetRowsPerSlice = 5000L)
    val wLeft = AsOfNative.suggestSliceWidth(hotLeft, Seq("k"), "t", 5000L)
    val wRight = AsOfNative.suggestSliceWidth(hotRight, Seq("k"), "t", 5000L)
    assert(wBoth.contains(math.min(wLeft.get, wRight.get)))
    // uniform data: plain path, parity trivially
    val (plainOut, plainW) = AsOfNative.asOfAuto(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    assert(plainW.isEmpty)
    assert(sortedRows(plainOut) == sortedRows(
      AsOfNative.asOf(leftFixture, rightFixture, Seq("k"), "t", "t", Seq("v"))))
  }

  test("tolerance tie-break parity on duplicate (key, time) right rows " +
      "(the tolerance path hashes rightTime into the tie struct)") {
    val l = Seq(("a", 10L, "x")).toDF("k", "t", "payload").repartition(2)
    val r = Seq(("a", 5L, 1.0), ("a", 5L, 2.0), ("a", 5L, 3.0))
      .toDF("k", "t", "v").repartition(2)
    val window = AsOfJoin.asOfTolerance(l, r, Seq("k"), "t", "t",
      Seq("v"), tolerance = 100L)
    val native = AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"),
      tolerance = Some(100L))
    assert(sortedRows(native) == sortedRows(window))
  }

  test("asOfSliced carries cross-slice matches for NULL keys (equi-joins " +
      "drop them; the window/native forms treat null as a key group)") {
    val l = Seq((Option.empty[String], 100L, "x"), (Some("a"), 100L, "y"))
      .toDF("k", "t", "payload").repartition(2)
    val r = Seq((Option.empty[String], 10L, 1.0), (Some("a"), 10L, 2.0))
      .toDF("k", "t", "v").repartition(2)
    // sliceWidth 50: right rows in slice 0, left rows in slice 2 — every
    // match crosses slices, so it rides the carry pipeline
    val sliced = AsOfNative.asOfSliced(l, r, Seq("k"), "t", "t",
      Seq("v"), sliceWidth = 50L)
    val plain = AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    assert(sortedRows(sliced) == sortedRows(plain))
    assert(sliced.filter(col("k").isNull)
      .select("asof_v").collect()(0).getDouble(0) == 1.0,
      "null-key carry lost")
  }

  test("asOfSliced supports rightVals overlapping the keys (plain asOf " +
      "dedupes; the sliced union must too)") {
    val sliced = AsOfNative.asOfSliced(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("k", "v"), sliceWidth = 4L)
    val plain = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("k", "v"))
    assert(sortedRows(sliced) == sortedRows(plain))
  }

  test("empty keys, floating keys, and a reserved-column collision are " +
      "rejected with routing messages") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "payload")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val e1 = intercept[IllegalArgumentException] {
      AsOfNative.asOf(l, r, Seq.empty, "t", "t", Seq("v"))
    }
    assert(e1.getMessage.contains("window form"))
    val lf = Seq((1.0, 10L, "x")).toDF("k", "t", "payload")
    val rf = Seq((1.0, 5L, 1.0)).toDF("k", "t", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsOfNative.asOf(lf, rf, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e2.getMessage.contains("floating-point"))
    val e3 = intercept[IllegalArgumentException] {
      AsOfNative.asOfSliced(l.withColumn("__graft_slice", lit(1)), r,
        Seq("k"), "t", "t", Seq("v"), sliceWidth = 10L)
    }
    assert(e3.getMessage.contains("reserved column"))
  }

  test("key-type mismatch is rejected up front (a mismatched hash would " +
      "silently mis-partition, not fail loud)") {
    val l = Seq((1, 10L, "x")).toDF("k", "t", "payload")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfNative.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("key 'k' types must match"))
  }

  test("plan shape: AsOfJoinExec present, one exchange per side, no Window " +
      "or Join fallback") {
    val native = AsOfNative.asOf(leftFixture, rightFixture,
      Seq("k"), "t", "t", Seq("v"))
    native.collect() // materialize (resolves any AQE re-planning)
    // AQE's toString prints the Final AND Initial plans — count in the
    // final section only
    val full = native.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(plan.contains("AsOfJoin ["), s"native exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window fallback leaked in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"join fallback leaked in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }
}
