package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench timed pass's interleaved sweep schedule — the property
  * the r11-r13 driver artifacts lacked: with reps run back-to-back per
  * query, a co-tenant burst longer than one query's reps inflated
  * EVERY observation of whichever query it landed on (min-of-k blind;
  * 8× "regressions" on untouched code, three rounds running). The
  * sweep-major order guarantees a contiguous burst shorter than
  * (reps-1) full sweeps leaves every query at least one clean
  * observation, so per-query min survives the burst. Pure simulation —
  * no Spark: slots run at unit cost, a burst adds a penalty to every
  * slot inside its window, and we compare the two schedules' per-query
  * minima. */
class BenchScheduleSpec extends AnyFunSuite {

  private val n = 26 // queries
  private val reps = 3

  /** Per-query min under a schedule with a contiguous burst over
    * execution slots [burstStart, burstStart + width). */
  private def minsUnder(order: Seq[(Int, Int)], burstStart: Int,
                        width: Int): Map[Int, Double] =
    order.zipWithIndex
      .map { case ((_, q), slot) =>
        q -> (if (slot >= burstStart && slot < burstStart + width) 11.0
              else 1.0)
      }
      .groupBy(_._1).map { case (q, ts) => q -> ts.map(_._2).min }

  test("shape: reps full sweeps, each covering every query once, in " +
      "suite order") {
    val sched = Bench.interleavedSchedule(n, reps)
    assert(sched.size == n * reps)
    (0 until reps).foreach { s =>
      val sweep = sched.slice(s * n, (s + 1) * n)
      assert(sweep.map(_._1).forall(_ == s))
      assert(sweep.map(_._2) == (0 until n))
    }
  }

  test("a contiguous burst up to (reps-1) sweeps wide leaves every " +
      "query a clean min under the interleaved schedule — at every " +
      "possible burst position") {
    val sched = Bench.interleavedSchedule(n, reps)
    val width = n * (reps - 1)
    (0 to n * reps - width).foreach { b =>
      val mins = minsUnder(sched, b, width)
      assert(mins.values.forall(_ == 1.0),
        s"burst at slot $b width $width wiped a query's every " +
          s"observation: ${mins.filter(_._2 > 1.0)}")
    }
  }

  test("the old back-to-back order loses some query's min to a burst " +
      "only `reps` slots wide — the failure mode the interleaving " +
      "removes") {
    val backToBack = for (q <- 0 until n; s <- 0 until reps) yield (s, q)
    val wiped = (0 to n * reps - reps).exists { b =>
      minsUnder(backToBack, b, reps).values.exists(_ > 1.0)
    }
    assert(wiped, "a reps-wide burst must be able to wipe a query's " +
      "every back-to-back observation (else this guard tests nothing)")
    // and the interleaved order shrugs the same burst off everywhere
    val sched = Bench.interleavedSchedule(n, reps)
    (0 to n * reps - reps).foreach { b =>
      assert(minsUnder(sched, b, reps).values.forall(_ == 1.0))
    }
  }

  test("summarize: median/min/max over sweeps; any failed observation " +
      "poisons the query to the -1 sentinel") {
    assert(Bench.summarize(Seq(3.0, 1.0, 2.0)) == (2.0, 1.0, 3.0))
    assert(Bench.summarize(Seq(5.0)) == (5.0, 5.0, 5.0))
    assert(Bench.summarize(Seq(3.0, -1.0, 2.0)) == (-1.0, -1.0, -1.0))
    assert(Bench.summarize(Nil) == (-1.0, -1.0, -1.0))
  }
}
