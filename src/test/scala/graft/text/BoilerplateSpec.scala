package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** [[Boilerplate.strip]] — the cross-doc semantics (planted shared
  * chunks vanish, within-doc repetition survives), the one-row-per-doc
  * contract, order preservation, and real-corpus conservation laws. */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(rows: Seq[(Long, String)], minDocs: Int = 2) =
    Boilerplate.strip(rows.toDF("doc_id", "text").repartition(2),
        "doc_id", "text", w = 4, modulus = 8, minDocs = minDocs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  // 60 distinct-ish tokens so chunk digests rarely collide by accident
  private val vocab = (1 to 60).map(i => s"w${i * 11 % 127}")

  test("identical docs are stripped to empty; a unique doc is untouched") {
    val shared = vocab.take(30).mkString(" ")
    val unique = vocab.slice(30, 60).mkString(" ")
    val got = strip(Seq((1L, shared), (2L, shared), (3L, unique)))
    assert(got.keySet === Set(1L, 2L, 3L))
    // every chunk of docs 1 and 2 occurs in ≥2 distinct docs
    assert(got(1L)._3 === "" && got(2L)._3 === "")
    assert(got(1L)._2 === 0L && got(1L)._1 > 0L)
    // the unique doc shares no chunk — fully kept, text == token stream
    assert(got(3L)._3 === unique)
    assert(got(3L)._2 === got(3L)._1)
  }

  test("within-doc repetition alone is NOT boilerplate (distinct-doc " +
      "count, not occurrence count)") {
    val block = vocab.take(20).mkString(" ")
    // one doc repeats its own block; no other doc shares it
    val got = strip(Seq(
      (1L, s"$block $block"),
      (2L, vocab.slice(20, 50).mkString(" "))))
    assert(got(1L)._2 === got(1L)._1, "self-repeat was stripped")
    assert(got(1L)._3.nonEmpty)
  }

  test("partially shared docs keep their unique chunks in original order") {
    // shared prefix long enough to fully cover several chunks; unique
    // tails differ per doc. CDC boundaries inside the shared prefix are
    // identical across docs (they depend only on the local window), so
    // all fully-shared chunks mark; the boundary-straddling chunk at the
    // prefix/tail seam differs per doc and survives.
    val shared = vocab.take(40)
    val tailA = vocab.slice(40, 55)
    val tailB = vocab.slice(45, 60).reverse
    val got = strip(Seq(
      (1L, (shared ++ tailA).mkString(" ")),
      (2L, (shared ++ tailB).mkString(" "))))
    got.foreach { case (id, (n, kept, text)) =>
      assert(kept < n, s"doc $id: nothing stripped")
      assert(kept > 0, s"doc $id: everything stripped")
    }
    // kept text is a contiguous-subsequence rebuild: every doc's output
    // tokens appear in the original order
    val origA = shared ++ tailA
    val outA = got(1L)._3.split(" ").toSeq
    def isSubseq(sub: Seq[String], full: Seq[String]): Boolean = {
      var i = 0
      full.foreach { t => if (i < sub.length && sub(i) == t) i += 1 }
      i == sub.length
    }
    assert(isSubseq(outA, origA))
    // the unique tail's tokens all survive
    assert(tailA.forall(outA.contains))
  }

  test("one row per input doc, counts consistent (real corpus)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = Boilerplate.strip(docs, "doc_id", "text").cache()
    try {
      assert(out.count() === docs.count())
      assert(out.filter(col("n_kept") > col("n_chunks")).count() === 0)
      assert(out.filter(col("n_kept") === 0 && col("text") =!= "").count() === 0)
      // conservation: token count of output == sum of kept chunk sizes
      val ch = CdcChunk.chunks(
        docs.select(col("doc_id").cast("long").as("doc_id"), col("text")),
        "doc_id", "text", 4, 8)
      val boiler = Boilerplate.frequentChunks(ch, 2).select("chunk_md5")
      val keptToks = ch.join(boiler, Seq("chunk_md5"), "left_anti")
        .agg(sum("n_toks")).collect()(0).getLong(0)
      val outToks = out.select(
          sum(when(col("text") === "", 0)
            .otherwise(size(split(col("text"), " ")))))
        .collect()(0).getLong(0)
      assert(outToks === keptToks)
    } finally out.unpersist()
  }

  test("minDocs raises the bar: higher threshold strips no more than lower") {
    val shared = vocab.take(30).mkString(" ")
    val rows = Seq((1L, shared), (2L, shared), (3L, shared),
      (4L, vocab.slice(30, 60).mkString(" ")))
    val at2 = strip(rows, minDocs = 2)
    val at4 = strip(rows, minDocs = 4)
    rows.foreach { case (id, _) =>
      assert(at4(id)._2 >= at2(id)._2, s"doc $id: minDocs=4 kept less")
    }
    // three copies: stripped at 2, kept at 4
    assert(at2(1L)._2 === 0L)
    assert(at4(1L)._2 === at4(1L)._1)
  }
}
