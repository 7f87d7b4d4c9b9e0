package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[CdcChunk.chunks]] — boundary arithmetic replayed with JVM md5 on
  * hand tokens, the partition laws, and the property the operator
  * exists for: boundaries RE-SYNC after an insertion, so downstream
  * chunk hashes survive.
  */
class CdcChunkSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash16(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 4), 16)

  /** Reference chunker — the contract restated in plain Scala. */
  private def refChunks(toks: Seq[String], w: Int, m: Int)
      : Seq[(Long, Long, Long, String)] = {
    val bp = (w to toks.length - 1).filter(j =>
      hash16(toks.slice(j - w, j).mkString(" ")) % m == 0)
    val cuts = 0 +: bp :+ toks.length
    cuts.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      ((i + 1).toLong, (a + 1).toLong, (b - a).toLong,
        md5hex(toks.slice(a, b).mkString(" ")))
    }.toSeq
  }

  private def engine(text: Seq[(Long, String)], w: Int, m: Int)
      : Map[Long, Seq[(Long, Long, Long, String)]] =
    CdcChunk.chunks(text.toDF("doc_id", "text").repartition(2),
        "doc_id", "text", w, m)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq)
      .toMap

  private val words =
    (1 to 80).map(i => s"tok${i * 7 % 97}")

  test("chunks == the contract replayed with JVM md5 (w=2, m=2)") {
    val text = words.take(40).mkString(" ")
    val got = engine(Seq((1L, text)), w = 2, m = 2)(1L)
    assert(got === refChunks(words.take(40), 2, 2))
    assert(got.length > 1, "degenerate: no boundary fired on 40 tokens")
  }

  test("chunks partition the doc contiguously") {
    val text = words.mkString(" ")
    val got = engine(Seq((1L, text)), w = 4, m = 4)(1L)
    assert(got.map(_._3).sum === 80L)
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 === a._2 + a._3)
      case _ =>
    }
  }

  test("empty and short docs emit exactly one chunk") {
    val got = engine(Seq((1L, ""), (2L, "only three toks")), w = 4, m = 2)
    assert(got(1L) === Seq((1L, 1L, 0L, md5hex(""))))
    assert(got(2L) ===
      Seq((1L, 1L, 3L, md5hex("only three toks"))))
  }

  test("insertion re-syncs: the chunk-hash suffix survives a prepended " +
      "token (fixed-size chunking would lose every chunk)") {
    val a = words.take(60)
    val b = "inserted" +: a
    val ca = refChunks(a, 4, 4).map(_._4)
    val cb = refChunks(b, 4, 4).map(_._4)
    val common = ca.reverse.zip(cb.reverse).takeWhile(p => p._1 == p._2)
      .length
    assert(common >= ca.length - 2,
      s"resync failed: only $common of ${ca.length} suffix chunks shared")
    // and the engine agrees with the reference on both docs
    val got = engine(Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))),
      w = 4, m = 4)
    assert(got(1L).map(_._4) === ca && got(2L).map(_._4) === cb)
  }
}
