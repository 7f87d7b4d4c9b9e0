package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** [[Curriculum.interleave]] — the ±1-exact prefix-proportionality law,
  * epoch determinism, and the map-only form's agreement contract. */
class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.load(spark, sfDir, "documents")

  test("prefix proportionality is ±1-exact at any pos_ppm threshold") {
    val out = Curriculum.interleave(docs, "doc_id", "lang").cache()
    try {
      val bandSizes = out.groupBy("band").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for (p <- Seq(125000L, 250000L, 500000L, 750000L, 999999L)) {
        val pref = out.filter(col("pos_ppm") < p).groupBy("band").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        bandSizes.foreach { case (b, nB) =>
          // rows below P: #{r : (r-1)*1e6 div nB < P} = ceil(P*nB/1e6)
          // bounded by the div floor
          val want = (p * nB + 999999L) / 1000000L
          val got = pref.getOrElse(b, 0L)
          assert(math.abs(got - want) <= 1L,
            s"band $b at P=$p: got $got, want ~$want (n_b=$nB)")
        }
      }
    } finally out.unpersist()
  }

  test("each band's ranks are a permutation 1..n_band; pos_ppm is " +
      "monotone in rank within a band") {
    val out = Curriculum.interleave(docs, "doc_id", "lang")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (b, rows) =>
      val ranks = rows.map(_._2).sorted
      assert(ranks.toSeq === (1L to rows.length.toLong),
        s"band $b ranks are not a permutation")
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.drop(1)).forall { case (a, c) => a <= c },
        s"band $b pos_ppm not monotone in rank")
    }
  }

  test("epochs permute deterministically: same epoch == same order, " +
      "different epochs differ") {
    def order(ep: Long) =
      Curriculum.interleave(docs, "doc_id", "lang", ep)
        .orderBy(col("pos_ppm"), col("band"), col("id"))
        .select("id").collect().map(_.getLong(0)).toSeq
    assert(order(1L) === order(1L))
    assert(order(1L) !== order(2L))
  }

  test("map-only form: same ids per band, positions in [0, 1e6), and " +
      "approximate proportionality at corpus scale") {
    val exact = Curriculum.interleave(docs, "doc_id", "lang")
    val fast = Curriculum.interleaveMapOnly(docs, "doc_id", "lang").cache()
    try {
      assert(fast.filter(col("pos_ppm") < 0 || col("pos_ppm") >= 1000000L)
        .count() === 0)
      assert(fast.select("id", "band").except(
        exact.select("id", "band")).count() === 0)
      // draws are uniform: the half-threshold prefix holds ~half of each
      // band (loose bound — this form trades the ±1 law for zero shuffle)
      val sizes = fast.groupBy("band").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val half = fast.filter(col("pos_ppm") < 500000L).groupBy("band")
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.foreach { case (b, n) =>
        val got = half.getOrElse(b, 0L).toDouble / n
        assert(got > 0.3 && got < 0.7, s"band $b half-prefix share $got")
      }
    } finally fast.unpersist()
  }
}
