package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Dsir]] — the two-model importance contract on a hand corpus where
  * every count is knowable. Raw: d1 "apple apple banana", d2 "banana
  * cherry", d3 "apple cherry cherry", d4 "" (empty). Target: d1.
  * Counts: cr = {apple 3, banana 2, cherry 3}, Tr = 8, V = 3;
  * ct = {apple 2, banana 1, cherry 0}, Tt = 3. Expected contributions
  * are computed with the SAME JVM ops the engine executes
  * (Math.log / Math.round), so the comparison is exact.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def raw = Seq(
    (1L, "apple apple banana"), (2L, "banana cherry"),
    (3L, "apple cherry cherry"), (4L, ""))
    .toDF("doc_id", "text").repartition(2)
  private def target = raw.filter(col("doc_id") === 1)

  private def e6(ct: Long, tt: Long, cr: Long, tr: Long, v: Long): Long =
    math.round(math.log((ct + 1).toDouble / (tt + v)) * 1e6) -
      math.round(math.log((cr + 1).toDouble / (tr + v)) * 1e6)

  private val wApple = e6(2, 3, 3, 8, 3)
  private val wBanana = e6(1, 3, 2, 8, 3)
  private val wCherry = e6(0, 3, 3, 8, 3)

  test("model emits the integer log-ratio per vocabulary token") {
    val m = Dsir.model(raw, target, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("apple" -> wApple, "banana" -> wBanana,
      "cherry" -> wCherry))
  }

  test("target-heavy tokens weigh positive, target-absent negative") {
    assert(wApple > 0 && wBanana > 0 && wCherry < 0)
  }

  test("score sums contributions per doc; empty doc scores zeros") {
    val sc = Dsir.score(raw, "doc_id", "text",
        Dsir.model(raw, target, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val s1 = 2 * wApple + wBanana
    val s2 = wBanana + wCherry
    val s3 = wApple + 2 * wCherry
    assert(sc(1L) === ((3L, s1, s1 / 3)))
    // negative numerators truncate toward zero on both engines
    assert(sc(2L) === ((2L, s2, -((-s2) / 2))))
    assert(sc(3L) === ((3L, s3, -((-s3) / 3))))
    assert(sc(4L) === ((0L, 0L, 0L)))
  }

  test("selectTop keeps the m highest sums (empty doc's 0 beats negatives)") {
    val ids = Dsir.selectTop(raw, target, "doc_id", "text", m = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 4L))
  }

  test("oovTargetFraction: zero for a raw slice, counted for an " +
      "external target with novel tokens") {
    val slice = Dsir.oovTargetFraction(raw, target, "doc_id", "text")
      .collect()(0)
    assert((slice.getLong(0), slice.getLong(2)) === ((0L, 0L)))
    val ext = Seq((7L, "apple zzznovel zzznovel"))
      .toDF("doc_id", "text")
    val r = Dsir.oovTargetFraction(raw, ext, "doc_id", "text").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 666666L) // 2e6 div 3
  }

  test("a doc of only target-absent tokens ranks last") {
    val ids = Dsir.selectTop(raw, target, "doc_id", "text", m = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L)) // d3 (apple + 2·cherry) is the floor
  }
}
