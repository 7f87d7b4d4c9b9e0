package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MmrSpec extends SparkTestBase {

  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long, Seq[Long])], parts: Int = 3) =
    rows.toDF("query_id", "neighbor_id", "rel", "codes").repartition(parts)

  private def run(d: org.apache.spark.sql.DataFrame, k: Int,
                  ln: Int = 7, ld: Int = 10, maxC: Int = 1024) =
    Mmr.diversify(d, k, ln, ld, maxC).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("planted near-duplicate is deferred: diversity beats relevance") {
    // query codes [10, 1]: A rel 100, B an exact near-dup of A (rel 100),
    // C orthogonal (rel 10). λ = 0.2 → after A, B scores 2·100 − 8·100 =
    // −600 while C scores 2·10 − 8·0 = 20: C is picked second.
    val rows = Seq(
      (1L, 100L, 100L, Seq(10L, 0L)), // A
      (1L, 101L, 100L, Seq(10L, 0L)), // B — duplicate of A, same rel
      (1L, 102L, 10L, Seq(0L, 10L))) // C — diverse, low rel
    val got = run(df(rows), k = 3, ln = 2, ld = 10)
    assert(got.map(_._3) == Seq(100L, 102L, 101L), got.toString)
    assert(got.map(_._4) == Seq(200L, 20L, -600L), got.toString)
  }

  test("lambda = 1 reduces to pure relevance ranking (id tie-break)") {
    val rnd = new scala.util.Random(11L)
    val rows = for (q <- 0L until 3L; i <- 0L until 10L)
      yield (q, 100 + i, rnd.nextInt(50).toLong,
        Seq.fill(4)(rnd.nextInt(11).toLong - 5))
    val got = run(df(rows), k = 4, ln = 10, ld = 10)
    val want = rows.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      cs.sortBy(c => (-c._3, c._2)).take(4).zipWithIndex
        .map { case (c, i) => (q, i + 1, c._2, 10L * c._3) }
    }.sortBy(t => (t._1, t._2))
    assert(got == want, s"$got != $want")
  }

  test("matches a local greedy reference on random candidates; " +
      "partition-invariant") {
    val rnd = new scala.util.Random(23L)
    val rows = for (q <- 0L until 4L; i <- 0L until 12L)
      yield (q, 200 + i, rnd.nextInt(200).toLong - 50,
        Seq.fill(6)(rnd.nextInt(9).toLong - 4))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      refMmr(q, cs.map(c => (c._2, c._3, c._4)), k = 5, ln = 7, ld = 10)
    }.sortBy(t => (t._1, t._2))
    assert(run(df(rows, 1), k = 5) == want)
    assert(run(df(rows, 7), k = 5) == want)
  }

  test("maxCandidates guard truncates to the top candidates by (rel, id)") {
    val rows = Seq(
      (1L, 10L, 90L, Seq(1L, 0L)),
      (1L, 11L, 80L, Seq(0L, 1L)),
      (1L, 12L, 999L, Seq(1L, 1L))) // highest rel — survives truncation
    // maxCandidates = 2 keeps ids 12 and 10; id 11 can never be selected
    val got = run(df(rows), k = 2, maxC = 2)
    assert(got.size == 2 && got.map(_._3).toSet == Set(12L, 10L), got.toString)
  }

  test("k larger than the group returns the whole group") {
    val rows = Seq((1L, 10L, 5L, Seq(1L)), (1L, 11L, 3L, Seq(2L)))
    assert(run(df(rows), k = 10).size == 2)
  }

  /** O(k·n²) reference greedy, independent of the operator's
    * incremental-maxSim bookkeeping. */
  private def refMmr(q: Long, cands: Seq[(Long, Long, Seq[Long])], k: Int,
                     ln: Int, ld: Int): Seq[(Long, Int, Long, Long)] = {
    def idot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    var remaining = cands.sortBy(c => (-c._2, c._1))
    val chosen = scala.collection.mutable.Buffer.empty[(Long, Long, Seq[Long])]
    val out = scala.collection.mutable.Buffer.empty[(Long, Int, Long, Long)]
    for (s <- 1 to math.min(k, cands.size)) {
      val scored = remaining.map { c =>
        val sim = if (chosen.isEmpty) 0L
                  else chosen.map(x => idot(x._3, c._3)).max
        (c, ln * c._2 - (ld - ln) * sim)
      }
      val (best, score) = scored.minBy { case (c, sc) => (-sc, c._1) }
      out += ((q, s, best._1, score))
      chosen += best
      remaining = remaining.filterNot(_._1 == best._1)
    }
    out.toSeq
  }
}
