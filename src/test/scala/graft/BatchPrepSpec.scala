package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the batching-prep queries (d_chunk,
  * d_pack_sequences) that the value-hash oracle can't articulate: chunk
  * coverage/overlap laws and packing conservation laws, checked on the real
  * sf0.001 documents table.
  */
class BatchPrepSpec extends SparkTestBase {

  private val chunks =
    SparkEntry.queries("d_chunk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("d_chunk: stride-40/window-50 chunks tile every token exactly") {
    import spark.implicits._
    val tokenCounts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == tokenCounts.keySet)
    byDoc.foreach { case (doc, cs) =>
      val n = tokenCounts(doc)
      val sorted = cs.sortBy(_._2)
      // chunk ids are contiguous from 0
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      // every chunk starts at stride*id and has min(50, n - start) tokens
      sorted.foreach { case (_, id, len) =>
        val start = id * 40
        assert(len == math.min(50L, math.max(n - start, 0L)), s"doc $doc chunk $id")
      }
      // tiling: last chunk reaches the end; consecutive full chunks overlap 10
      val (_, lastId, lastLen) = sorted.last
      assert(lastId * 40 + lastLen == math.max(n, 0L) || n == 0)
    }
  }

  test("d_pack_sequences: packing conserves tokens and docs per language") {
    import spark.implicits._
    val packed = SparkEntry.queries("d_pack_sequences")(spark, sfDir)
      .select(col("lang"), col("bin"), col("n_docs"), col("total_tokens"))
      .as[(String, Long, Long, Long)].collect()
    val source = Tables.load(spark, sfDir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(graft.text.TextOps.tokenCountWs(col("text")).cast("long")).as("tok"))
      .as[(String, Long, Long)].collect()
      .map { case (l, n, t) => l -> (n, t) }.toMap
    packed.groupBy(_._1).foreach { case (lang, bins) =>
      val (nDocs, nTok) = source(lang)
      assert(bins.map(_._3).sum == nDocs, s"$lang doc conservation")
      assert(bins.map(_._4).sum == nTok, s"$lang token conservation")
      // first bin is 0 and bins are distinct (a doc longer than the 512
      // context can legitimately skip bins, so density isn't asserted)
      val ids = bins.map(_._2).sorted.toSeq
      assert(ids.head == 0L && ids.distinct == ids, s"$lang bins")
    }
  }
}
