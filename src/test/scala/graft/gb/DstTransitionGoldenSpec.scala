package graft.gb

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end F7/F8 golden over a SYNTHETIC feed with VALID DST rules —
  * the seam no real corpus in the checkout exercises (Enbridge's
  * dstEndRule 0x67271F70 is invalid → DST disabled, matching
  * lib.rs:145-156; the Hydro One 60-minute file is stripped). The feed's
  * hourly readings straddle spring-forward 2024, fall-back 2024, and
  * spring-forward 2025, so the local-time offset provably changes
  * MID-SERIES and the per-(file, year) bounds map is exercised across
  * two years. Expected values are hand-computed from the reference
  * semantics: naive-UTC strict bounds `dst_start < t < dst_end`
  * (lib.rs:157-162), rule→date per local_time_parameters.rs:43-143.
  */
class DstTransitionGoldenSpec extends SparkTestBase {

  private val feedPath = {
    val dir = java.nio.file.Files.createTempDirectory("dst_synth").toFile
    val f = new java.io.File(dir, "dst_transition_synthetic.xml")
    val in = getClass.getResourceAsStream("/dst_transition_synthetic.xml")
    java.nio.file.Files.copy(in, f.toPath)
    in.close()
    f.getAbsolutePath
  }

  // rule → transition instants (unit-level pin for the e2e expectations)
  test("NA rules anchor the transitions this feed depends on") {
    assert(DstRules.epochOf(0x360E2000L, 2024) == Some(1710208800L), // 2024-03-12 02:00
      "dstStartRule 2024")
    assert(DstRules.epochOf(0xB40E2000L, 2024) == Some(1730772000L), // 2024-11-05 02:00
      "dstEndRule 2024")
    assert(DstRules.epochOf(0x360E2000L, 2025) == Some(1741658400L), // 2025-03-11 02:00
      "dstStartRule 2025")
  }

  // input UTC epoch → expected local epoch: +tzOffset(-18000), +3600 iff
  // STRICTLY inside the year's (start, end) naive window
  private val expected = Map(
    // spring-forward 2024 (window opens 1710208800)
    1710201600L -> 1710183600L, // 00:00 — before
    1710205200L -> 1710187200L, // 01:00 — before
    1710208800L -> 1710190800L, // 02:00 — AT the bound: strict >, no shift
    1710212400L -> 1710198000L, // 03:00 — inside, +3600
    1710216000L -> 1710201600L, // 04:00 — inside
    1710219600L -> 1710205200L, // 05:00 — inside
    // fall-back 2024 (window closes 1730772000)
    1730764800L -> 1730750400L, // 00:00 — inside, +3600
    1730768400L -> 1730754000L, // 01:00 — inside (collides with 02:00 std!)
    1730772000L -> 1730754000L, // 02:00 — AT the bound: strict <, no shift
    1730775600L -> 1730757600L, // 03:00 — after
    1730779200L -> 1730761200L, // 04:00 — after
    1730782800L -> 1730764800L, // 05:00 — after
    // spring-forward 2025 (window opens 1741658400 — a DIFFERENT date
    // than 2024: the per-year bounds map must not reuse 2024's)
    1741654800L -> 1741636800L, // 01:00 — before
    1741662000L -> 1741647600L) // 03:00 — inside, +3600

  private def check(mode: ParseMode): Unit = {
    val ts = GreenButton.timeseries(spark, feedPath, mode)
    val rows = ts.select(col("value").cast("int"),
        col("time_period_start_unix"), col("cost"),
        col("time_period_duration_seconds"), col("title"))
      .collect()
    assert(rows.length == expected.size, s"row count ${rows.length}")
    // value encodes the input instant (1000+i / 2000+i / 3000+i in block
    // order) — recover it to key the expectation map
    val inputByValue = Map(
      1000 -> 1710201600L, 1001 -> 1710205200L, 1002 -> 1710208800L,
      1003 -> 1710212400L, 1004 -> 1710216000L, 1005 -> 1710219600L,
      2000 -> 1730764800L, 2001 -> 1730768400L, 2002 -> 1730772000L,
      2003 -> 1730775600L, 2004 -> 1730779200L, 2005 -> 1730782800L,
      3000 -> 1741654800L, 3001 -> 1741662000L)
    rows.foreach { r =>
      val input = inputByValue(r.getInt(0))
      assert(r.getLong(1) == expected(input),
        s"value ${r.getInt(0)} (utc $input): got ${r.getLong(1)}, " +
          s"want ${expected(input)}")
      assert(r.getInt(3) == 3600)
      assert(r.getString(4) == "Hourly Usage")
    }
    // the offset CHANGES mid-series: local - utc takes both -18000 and
    // -14400 within one title
    val offsets = rows.map(r => r.getLong(1) - inputByValue(r.getInt(0)))
      .toSet
    assert(offsets == Set(-18000L, -14400L), s"offsets seen: $offsets")
    // fall-back ambiguity is REAL in the output: two readings (std 02:00
    // and dst 01:00) land on the same local epoch
    val dupLocal = rows.groupBy(_.getLong(1)).filter(_._2.size > 1)
    assert(dupLocal.keySet == Set(1730754000L),
      s"expected exactly the fall-back collision, got ${dupLocal.keySet}")
    // cost normalization rides along: ÷100000 of the planted cents
    val costs = rows.map(r => (r.getInt(0) / 1000, r.getFloat(2))).toSet
    assert(costs == Set((1, 0.12345f), (2, 0.2f), (3, 0.3f)),
      s"costs: $costs")
  }

  test("failfast mode: DST shift changes mid-series, both transitions") {
    check(FailFast)
  }

  test("permissive mode: identical output (no bad files to drop)") {
    check(Permissive)
  }
}
