package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** r15 verdict #3 follow-through: the shortlist fetch's THREE regimes
  * return identical rows, and the literal-`isin` form never exceeds
  * [[Similarity.MaxIsinShortlistIds]] values (the measured crossover —
  * IsinCapMeasure / SCALE.md r16). */
class ShortlistRegimeSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(n: Int) =
    (0L until n.toLong).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("vec_id", "embedding").localCheckpoint(true)

  private def shortlist(ids: Seq[Long]) =
    ids.map(i => (i % 7, i)).toDF("query_id", "neighbor_id")
      .localCheckpoint(true)

  private def fetched(sl: org.apache.spark.sql.DataFrame,
                      c: org.apache.spark.sql.DataFrame) =
    Similarity.shortlistEmbeddings(sl, c).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("neighbor_id")),
        r.getSeq[Float](r.fieldIndex("c_emb")).head)).toSet

  test("small shortlist (literal regime), mid shortlist (localized " +
      "broadcast-join regime, > MaxIsinShortlistIds) and the over-cap " +
      "fallback all fetch identical rows") {
    val c = corpus(20000)
    val small = (0L until 1000L).map(_ * 17 % 20000).distinct
    val mid = (0L until (Similarity.MaxIsinShortlistIds + 500L))
      .map(_ * 13 % 20000).distinct
    val smallGot = fetched(shortlist(small), c)
    assert(smallGot == small.map(i => (i % 7, i, i.toFloat)).toSet)
    val midGot = fetched(shortlist(mid), c)
    assert(midGot == mid.map(i => (i % 7, i, i.toFloat)).toSet)
    // ids absent from the corpus drop in every regime (inner join)
    val withGhosts = shortlist(Seq(1L, 2L, 999999L))
    assert(fetched(withGhosts, c) ==
      Set((1L, 1L, 1f), (2L, 2L, 2f)))
  }

  test("the mid regime plans a broadcast join, not a giant In literal") {
    val c = corpus(20000)
    val mid = (0L until (Similarity.MaxIsinShortlistIds + 500L))
      .map(_ * 13 % 20000).distinct
    val plan = Similarity.shortlistEmbeddings(shortlist(mid), c)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      "mid-regime fetch must be broadcast-join shaped")
    // the literal form would print thousands of values into the filter
    assert(!plan.contains(" INSET "),
      "mid-regime fetch must not inline the id set")
  }
}
