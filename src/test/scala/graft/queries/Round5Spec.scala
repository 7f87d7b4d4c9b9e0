package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.load
import graft.operators.AsOfJoin

/** Semantic checks for the round-5 queries: every claim that the DuckDB
  * oracle can't express as SQL-vs-SQL gets an independent in-engine
  * formulation here (fold vs staged joins, native session_window vs manual
  * islands, SCD2 chain laws, positional median vs a collected reference).
  */
class Round5Spec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  // ---------------------------------------------------------------- as-of

  test("asOfTolerance nulls matches older than the tolerance, keeps fresh " +
      "ones, and preserves left cardinality") {
    val left = Seq(
      (1L, "k1", 1000L), // right at 990 → age 10, fresh
      (2L, "k1", 2000L), // latest right still 990 → age 1010, stale
      (3L, "k2", 500L)   // no right rows
    ).toDF("id", "k", "t")
    val right = Seq(("k1", 990L, 7.0)).toDF("k", "rt", "v")

    val got = AsOfJoin.asOfTolerance(left, right, Seq("k"), "t", "rt",
        Seq("v"), tolerance = 100L)
      .select(col("id"), col("asof_v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(got.size == 3)
    assert(got(1L).contains(7.0))
    assert(got(2L).isEmpty, "match beyond tolerance must null out")
    assert(got(3L).isEmpty)
  }

  test("asOfTolerance keeps the right-time column when it is itself a " +
      "requested value") {
    val left = Seq((1L, "k1", 1000L)).toDF("id", "k", "t")
    val right = Seq(("k1", 990L, 7.0)).toDF("k", "rt", "v")
    val row = AsOfJoin.asOfTolerance(left, right, Seq("k"), "t", "rt",
      Seq("rt", "v"), tolerance = 100L).select(col("asof_rt"), col("asof_v")).head
    assert(row.getLong(0) == 990L && row.getDouble(1) == 7.0)
  }

  test("asOfNearest picks the closer side, breaks equidistant ties toward " +
      "the past, and falls back across directions") {
    val left = Seq(
      (1L, "k1", 100L), // back at 90 (d=10), fwd at 105 (d=5) → fwd
      (2L, "k1", 80L),  // back at 70 (d=10), fwd at 90 (d=10) → tie → back
      (3L, "k1", 10L),  // nothing before → fwd 70
      (4L, "k2", 50L)   // no right rows at all → null
    ).toDF("id", "k", "t")
    val right = Seq(("k1", 70L), ("k1", 90L), ("k1", 105L)).toDF("k", "rt")
    val got = graft.operators.AsOfJoin.asOfNearest(left, right, Seq("k"),
        "t", "rt", Seq("rt"))
      .select(col("id"), col("asof_rt"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(105L), 2L -> Some(70L),
      3L -> Some(70L), 4L -> None), s"got $got")
  }

  test("asOfNearest preserves left rows with NULL time (null-padded, " +
      "not dropped)") {
    val left = Seq((1L, "k1", Some(100L)), (2L, "k1", None))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 90L)).toDF("k", "rt")
    val got = graft.operators.AsOfJoin.asOfNearest(left, right, Seq("k"),
        "t", "rt", Seq("rt"))
      .select(col("id"), col("asof_rt"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == 2, s"left row dropped: $got")
    assert(got(1L).contains(90L))
    assert(got(2L).isEmpty,
      "NULL left time must null-pad, not fabricate a nearest match")
  }

  // --------------------------------------------------------------- funnel

  test("q_funnel fold agrees with the staged-join formulation") {
    val e = load(spark, sfDir, "events")
      .filter(col("ts") < to_timestamp(lit("2024-01-04 00:00:00")))
      .select(col("user_id"),
        (unix_timestamp(col("ts")) * 1000000L + col("event_id")).as("k"),
        col("event_type"))
      .cache()
    def firstAfter(evType: String, prev: org.apache.spark.sql.DataFrame,
                   prevKey: String, outKey: String) =
      e.filter(col("event_type") === evType).as("e")
        .join(prev.as("p"), col("e.user_id") === col("p.user_id"))
        .filter(col("e.k") > col(prevKey))
        .groupBy(col("e.user_id").as("user_id"))
        .agg(min(col("e.k")).as(outKey))
    val s0 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("k")).as("k0"))
    val v1 = firstAfter("view", s0, "k0", "k1")
    val c2 = firstAfter("click", v1, "k1", "k2")
    val p3 = firstAfter("purchase", c2, "k2", "k3")
    val users = e.select(col("user_id")).distinct()
    val joinStages = users
      .join(s0, Seq("user_id"), "left").join(v1, Seq("user_id"), "left")
      .join(c2, Seq("user_id"), "left").join(p3, Seq("user_id"), "left")
      .select(
        when(col("k3").isNotNull, 4).when(col("k2").isNotNull, 3)
          .when(col("k1").isNotNull, 2).when(col("k0").isNotNull, 1)
          .otherwise(0).cast("long").as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val folded = SparkEntryRef.funnel(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == joinStages,
      s"fold=$folded join=$joinStages must agree")
    assert(folded.values.sum == users.count())
    e.unpersist()
  }

  // ------------------------------------------------------------- sessions

  test("q_session_native matches manual >1800s gaps-and-islands sessions " +
      "(touching windows MERGE: an event at prev + gap extends)") {
    val e = load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("epoch_s"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"), col("event_id"))
    val manual = e
      .withColumn("gap",
        when(col("epoch_s") - lag(col("epoch_s"), 1).over(w) > 1800, 1)
          .otherwise(0))
      .withColumn("isl", sum(col("gap")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("isl"))
      .agg(min(col("epoch_s")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("epoch_s")) - min(col("epoch_s"))).as("duration_s"))
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("duration_s"))

    val native = graft.queries.Round5Queries
      .queries("q_session_native")(spark, sfDir)
    assert(native.exceptAll(manual).isEmpty && manual.exceptAll(native).isEmpty,
      "session_window sessions must equal the manual islands")
  }

  test("q_session_native boundary: an event exactly gap seconds after the " +
      "previous MERGES (touching session windows), driven through the " +
      "real query") {
    // sf0.1 exposed this: Spark merges touching windows, so the islands
    // oracle must split strictly on diff > gap. Plant the exact-1800s
    // pair plus a clearly-split pair and run the SHIPPED query on it.
    val dir = java.nio.file.Files.createTempDirectory("sess_boundary").toString
    Seq(
      (1L, 1000000L * 1000000000L, 7L, "x", 1.0, "{}"),
      (2L, 1001800L * 1000000000L, 7L, "x", 1.0, "{}"), // exactly gap → merge
      (3L, 1005000L * 1000000000L, 7L, "x", 1.0, "{}"), // 3200s → new session
      (4L, 1006801L * 1000000000L, 7L, "x", 1.0, "{}")  // gap+1 → new session
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.Round5Queries
      .queries("q_session_native")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List((1000000L, 2L, 1800L), (1005000L, 1L, 0L),
      (1006801L, 1L, 0L)), s"boundary semantics changed: $got")
  }

  // ----------------------------------------------------------------- scd2

  test("d_scd2 ranges chain per user, exactly one current row, no " +
      "consecutive equal attrs") {
    val rows = graft.queries.Round5Queries.queries("d_scd2")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, rs) =>
      val sorted = rs.sortBy(_._3)
      // each non-final row closes exactly at the next row's open
      sorted.sliding(2).foreach {
        case Array((_, a1, _, to1), (_, a2, from2, _)) =>
          assert(to1 == from2, s"user $user: gap/overlap $to1 vs $from2")
          assert(a1 != a2, s"user $user: uncompressed equal attrs")
        case _ =>
      }
      assert(sorted.count(_._4 == -1L) == 1,
        s"user $user must have exactly one open (current) version")
      assert(sorted.last._4 == -1L)
    }
  }

  // --------------------------------------------------------------- median

  test("q_median_iqr positional median matches a collected reference") {
    val cents = load(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    val got = graft.queries.Round5Queries.queries("q_median_iqr")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    cents.foreach { case (t, sorted) =>
      val n = sorted.length
      val med2 = sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)
      assert(got(t)._1 == n.toLong, s"$t count")
      assert(got(t)._2 == med2, s"$t median2: got ${got(t)._2}, want $med2")
    }
  }

  // ------------------------------------------------------------ winsorize

  test("d_winsorize bounds clip: lo <= hi and sum_clip within [n*lo, n*hi]") {
    val rows = graft.queries.Round5Queries.queries("d_winsorize")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi, raw, clip) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= hi)
      assert(clip >= n * lo && clip <= n * hi)
      // clipping can only pull the sum toward the bounds interval
      assert(raw >= clip - (n * (hi - lo)))
    }
  }

  // ------------------------------------------------------------ ngram dup

  test("ngramHashes coverage counts equal the string-shingle formulation " +
      "on real documents") {
    def coverage(gramCol: org.apache.spark.sql.Column) = {
      val grams = load(spark, sfDir, "documents")
        .select(col("doc_id"), explode(array_distinct(gramCol)).as("g"))
      val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
      grams.join(counts, "g").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    }
    val toks = graft.text.TextOps.tokens(col("text"))
    val byHash = coverage(graft.text.TextOps.ngramHashes(toks, 5))
    val byString = coverage(graft.text.TextOps.shingles(toks, 5))
    assert(byHash == byString,
      "64-bit gram ids must reproduce exact string-gram coverage")
  }

  test("d_dedup_ngram_cross flags planted duplicate documents") {
    // two identical docs + one unique: all grams of the twins are shared,
    // the unique doc shares none
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text").repartition(2)
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(graft.text.TextOps.ngramHashes(
        graft.text.TextOps.tokens(col("text")), 5))).as("g"))
    val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    val got = grams.join(counts, "g").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(got == List((1L, 2L, 2L), (2L, 2L, 2L), (3L, 3L, 0L)))
  }

  test("d_dedup_ngram_cross excludes sub-n-token docs, matching the " +
      "oracle's empty-gram semantics") {
    // drive the REAL query against a planted table containing a 2-token
    // doc: it must produce NO row for it (the oracle's generate_series is
    // empty there), not a (doc_id, 0, 0) row
    val dir = java.nio.file.Files.createTempDirectory("ngram_short").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "too short")
    ).toDF("doc_id", "text").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Round5Queries
      .queries("d_dedup_ngram_cross")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(out == List((1L, 2L, 2L), (2L, 2L, 2L)),
      s"short doc leaked or twins mis-counted: $out")
  }
}

/** Accessor kept out of the test class so the funnel test reads as the
  * equivalence claim it is. */
private object SparkEntryRef {
  def funnel(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.queries.Round5Queries.queries("q_funnel")(s, dir)
}
