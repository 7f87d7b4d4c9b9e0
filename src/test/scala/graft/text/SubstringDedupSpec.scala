package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SubstringDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text").repartition(2)

  private def spanRows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("planted boilerplate: shared L-window marks merged maximal spans " +
      "with 1-based inclusive bounds") {
    // L=10; "BOILERPLATE" is 11 chars → two overlapping windows per site
    val d = docs(
      (1L, "xxBOILERPLATEyyyyyyy"),
      (2L, "zzzzBOILERPLATEwwww"))
    val got = spanRows(SubstringDedup.spans(d, "doc_id", "text", 10))
    // doc 1: windows at pos 3,4 → span [3, 13]; doc 2: pos 5,6 → [5, 15]
    assert(got == Seq((1L, 3L, 13L, 2L), (2L, 5L, 15L, 2L)), got.toString)
  }

  test("within-doc repetition alone is NOT marked (minDocs counts " +
      "distinct docs)") {
    val d = docs(
      (1L, "ABCDEFGHIJxxABCDEFGHIJ"), // repeated within one doc only
      (2L, "nothing shared here at all"))
    val got = spanRows(SubstringDedup.spans(d, "doc_id", "text", 10))
    assert(got.isEmpty, got.toString)
  }

  test("docs shorter than L never produce windows or spans") {
    val d = docs((1L, "short"), (2L, "short"), (3L, "tiny"))
    val got = spanRows(SubstringDedup.spans(d, "doc_id", "text", 10))
    assert(got.isEmpty, got.toString)
  }

  test("two disjoint shared regions in one doc merge into TWO islands, " +
      "not one") {
    val shared1 = "AAAAAAAAAA" // 10 chars = exactly one window at L=10
    val shared2 = "BBBBBBBBBB"
    val d = docs(
      (1L, s"$shared1--------------------$shared2"),
      (2L, s"pad$shared1"),
      (3L, s"pad$shared2"))
    val got = spanRows(SubstringDedup.spans(d, "doc_id", "text", 10))
      .filter(_._1 == 1L)
    assert(got == Seq((1L, 1L, 10L, 1L), (1L, 31L, 40L, 1L)),
      got.toString)
  }

  test("parity with the direct gram-groupBy reference on a generated " +
      "corpus (hash pre-filter + text verification change nothing)") {
    val rnd = new scala.util.Random(11L)
    val words = Seq("spark", "scan", "join", "agg", "row", "hash")
    val boiler = "COMMON LICENSE HEADER TEXT"
    val rows = (0L until 60L).map { i =>
      val body = Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" ")
      (i, if (i % 3 == 0) s"$boiler $body" else body)
    }
    val d = docs(rows: _*)
    val L = 12
    val got = spanRows(SubstringDedup.spans(d, "doc_id", "text", L))
    // reference: group directly on gram text, no hash stage
    val w = d.filter(length(col("text")) >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1L), (length(col("text")) - (L - 1))
          .cast("long"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        col("text").substr(col("pos"), lit(L)).as("gram"))
    val dup = w.groupBy("gram")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") >= 2)
      .select("gram")
    val marked = w.join(dup, Seq("gram"), "left_semi")
      .select("doc_id", "pos")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ref = marked
      .withColumn("brk", when(lag(col("pos"), 1).over(byDoc).isNull
        .or(col("pos") > lag(col("pos"), 1).over(byDoc) + L), 1L)
        .otherwise(0L))
      .withColumn("g", sum(col("brk")).over(byDoc
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "g")
      .agg(min("pos").as("span_start"),
        (max(col("pos")) + (L - 1)).as("span_end"),
        count(lit(1)).as("n_win"))
      .select("doc_id", "span_start", "span_end", "n_win")
    assert(got == spanRows(ref), s"got=$got")
    assert(got.nonEmpty, "generated corpus must actually share boilerplate")
  }

  test("strip removes exactly the spans; fully-covered doc keeps an " +
      "EMPTY row; span-free doc is untouched") {
    val d = docs(
      (1L, "xxBOILERPLATEyyyyyyy"),
      (2L, "zzzzBOILERPLATEwwww"),
      (3L, "AAAAAAAAAA"),  // == doc 4: fully covered
      (4L, "AAAAAAAAAA"),
      (5L, "unique text, no span here"))
    val sp = SubstringDedup.spans(d, "doc_id", "text", 10)
    val got = SubstringDedup.strip(d, sp, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, "xx" + "yyyyyyy"), // span [3,13] is exactly BOILERPLATE
      (2L, "zzzz" + "wwww"),  // span [5,15]
      (3L, ""), (4L, ""),
      (5L, "unique text, no span here")), got.toString)
    // length accounting: removed bytes == sum of span lengths
    val spanLen = sp.select(sum(col("span_end") - col("span_start") + 1))
      .collect()(0).getLong(0)
    val origLen = d.select(sum(length(col("text")))).collect()(0).getLong(0)
    val cleanLen = got.map(_._2.length.toLong).sum
    assert(origLen - cleanLen == spanLen)
  }

  test("guards: L and minDocs bounds reject") {
    val d = docs((1L, "abc"))
    intercept[IllegalArgumentException](
      SubstringDedup.spans(d, "doc_id", "text", 1))
    intercept[IllegalArgumentException](
      SubstringDedup.spans(d, "doc_id", "text", 10, minDocs = 1))
  }
}
