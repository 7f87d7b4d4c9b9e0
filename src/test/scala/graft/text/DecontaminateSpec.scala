package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Decontaminate]] — planted 8-gram overlap on hand docs, and the
  * load-bearing invariant of the Bloom path: flagBloom == flag EXACTLY,
  * at any filter sizing (false positives die in the verify join).
  */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // eval doc 100 = tokens a..j; doc 1 embeds two of its 8-grams
  // (a..h and b..i); doc 2 shares nothing
  private def corpus = Seq(
    (1L, "z a b c d e f g h i"),
    (2L, "one two three four five six seven eight nine"),
    (100L, "a b c d e f g h i j"))
    .toDF("doc_id", "text").repartition(2)
  private def eval = corpus.filter(col("doc_id") === 100)

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq

  test("exact flag counts shared distinct grams") {
    val got = rows(Decontaminate.flag(corpus, eval, "doc_id", "text"))
    assert(got === Seq((1L, 2L, true), (2L, 0L, false),
      (100L, 3L, true))) // the eval doc matches itself on all 3 grams
  }

  test("bloom path equals exact path on planted docs") {
    val exact = rows(Decontaminate.flag(corpus, eval, "doc_id", "text"))
    val bloom = rows(Decontaminate.flagBloom(corpus, eval, "doc_id", "text"))
    assert(bloom === exact)
  }

  test("bloom == exact on real data even with a saturated tiny filter") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val ev = docs.filter(col("doc_id") < 5)
    val exact = rows(Decontaminate.flag(docs, ev, "doc_id", "text"))
    // 64 bits for thousands of grams — near-100% false-positive rate;
    // the verify join must still deliver the exact rows
    val bloom = rows(Decontaminate.flagBloom(docs, ev, "doc_id", "text",
      estimatedItems = 8L, numBits = 64L))
    assert(bloom === exact)
    assert(exact.count(_._3) >= 5) // at least the eval slice self-matches
  }

  test("attribution: planted per-pair overlap counts; docs contaminated " +
      "by two eval items get two rows") {
    // eval 100 = a..j, eval 101 = k..t; doc 1 embeds grams of BOTH
    val twoEval = Seq(
      (1L, "a b c d e f g h x k l m n o p q r s"),
      (2L, "nothing shared here at all in any gram of eight tokens"),
      (100L, "a b c d e f g h i j"),
      (101L, "k l m n o p q r s t"))
      .toDF("doc_id", "text").repartition(2)
    val ev = twoEval.filter(col("doc_id") >= 100L)
    val got = Decontaminate.attribute(twoEval, ev, "doc_id", "doc_id",
        "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // doc 1: one 8-gram of eval 100 (a..h) and two of eval 101
    // (k..r, l..s); eval docs self-match fully (3 grams of a 10-token
    // doc); doc 2 absent
    assert(got === Set(
      (1L, 100L, 1L), (1L, 101L, 2L),
      (100L, 100L, 3L), (101L, 101L, 3L)))
  }

  test("attribution is consistent with flag on the real corpus: a doc " +
      "is contaminated iff it has attribution rows, and pair sums " +
      "bound n_hits") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val ev = docs.filter(col("doc_id") < 5)
    val flag = Decontaminate.flag(docs, ev, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val attrib = Decontaminate.attribute(docs, ev, "doc_id", "doc_id",
        "text")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(attrib.keySet === flag.filter(_._2 > 0).keySet)
    attrib.foreach { case (id, pairSum) =>
      // a gram shared with two eval docs counts once in flag, once per
      // pair in attribution
      assert(pairSum >= flag(id), s"doc $id: $pairSum < ${flag(id)}")
    }
  }
}
