package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamingDedup.{StreamDoc, StreamDup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val textB = "spark structured streaming processes unbounded data with incremental state"
  private val textC = "minhash signatures compress shingle sets into fixed width sketches cheaply"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = util.Try(spark.conf.get(key)).toOption
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming near-dup: cross-batch and same-batch exact duplicates " +
      "surface; distinct docs stay silent; state carries across batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[StreamDoc]
      val dups = StreamingDedup.nearDupCandidates(mem.toDF())
      val q = dups.writeStream.outputMode("append")
        .format("memory").queryName("sdedup_out").start()
      try {
        // batch 1: three distinct docs
        mem.addData(StreamDoc(1, textA), StreamDoc(2, textB),
          StreamDoc(3, textC))
        q.processAllAvailable()
        val b1 = spark.sql("SELECT * FROM sdedup_out").as[StreamDup].collect()
        assert(b1.isEmpty, s"distinct docs paired: ${b1.toSeq}")

        // batch 2: an exact copy of doc 1 (cross-batch, via RocksDB state),
        // a fresh doc, and TWO same-batch copies of doc 2
        mem.addData(StreamDoc(4, textA),
          StreamDoc(5, "completely unrelated content about parquet files and columns"),
          StreamDoc(6, textB), StreamDoc(7, textB))
        q.processAllAvailable()
        val out = spark.sql("SELECT * FROM sdedup_out").as[StreamDup].collect()

        // the pair set, collapsed across bands
        val pairs = out.map(d => (d.doc_id, d.dup_of)).toSet
        assert(pairs.contains((4L, 1L)), s"cross-batch dup missed: $pairs")
        assert(pairs.contains((6L, 2L)) || pairs.contains((7L, 2L)),
          s"same-batch dup vs seen state missed: $pairs")
        assert(pairs.contains((7L, 6L)) || pairs.contains((6L, 7L)),
          s"same-batch pair missed: $pairs")
        // exact copies collide in EVERY band with matching full signature
        val fourVsOne = out.filter(d => d.doc_id == 4L && d.dup_of == 1L)
        assert(fourVsOne.length == 8, s"expected 8 band hits, got ${fourVsOne.length}")
        assert(fourVsOne.forall(_.exact_sig))
        // no false pair involving the fresh doc or across distinct texts
        assert(!pairs.exists { case (a, b) => Set(a, b).contains(5L) })
        assert(!pairs.exists { case (a, b) =>
          Set(a, b) == Set(1L, 2L) || Set(a, b) == Set(1L, 3L) ||
            Set(a, b) == Set(2L, 3L) })
      } finally q.stop()
    }
  }

  test("banding stage is bit-identical to the batch operator: streaming " +
      "candidates == minhashPairs candidates on the same corpus") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val docsSeq = Seq(StreamDoc(1, textA), StreamDoc(2, textB),
        StreamDoc(3, textC), StreamDoc(10, textA), StreamDoc(11, textB))
      val mem = MemoryStream[StreamDoc]
      val dups = StreamingDedup.nearDupCandidates(mem.toDF())
      val q = dups.writeStream.outputMode("append")
        .format("memory").queryName("sdedup_parity").start()
      try {
        docsSeq.foreach { d => mem.addData(d); q.processAllAvailable() }
        val streamPairs = spark.sql("SELECT * FROM sdedup_parity")
          .as[StreamDup].collect()
          .map(d => (math.min(d.doc_id, d.dup_of), math.max(d.doc_id, d.dup_of)))
          .toSet
        val batchPairs = graft.similarity.Similarity.minhashPairs(
            docsSeq.toDF("doc_id", "text"), "doc_id", "text",
            shingleN = 3, numHashes = 32, numBands = 8, minJaccard = 0.0)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(streamPairs == batchPairs,
          s"stream $streamPairs != batch $batchPairs")
      } finally q.stop()
    }
  }

  test("VERIFIED streaming pairs == minhashPairs' FULL contract (ids AND " +
      "exact jaccard, one row per pair), across batch boundaries") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val textA2 = textA.replace("today", "tonight") // near-dup of textA
      val docsSeq = Seq(StreamDoc(1, textA), StreamDoc(2, textB),
        StreamDoc(3, textC), StreamDoc(10, textA), StreamDoc(11, textB),
        StreamDoc(12, textA2))
      val mem = MemoryStream[StreamDoc]
      val verified = StreamingDedup.nearDupVerified(mem.toDF(),
        minJaccard = 0.3)
      val q = verified.writeStream.outputMode("append")
        .format("memory").queryName("sdedup_verified").start()
      try {
        // mixed batching: cross-batch pairs (1↔10 span batches) AND
        // same-batch pairs (10, 11, 12 arrive together)
        mem.addData(docsSeq(0), docsSeq(1)); q.processAllAvailable()
        mem.addData(docsSeq(2)); q.processAllAvailable()
        mem.addData(docsSeq(3), docsSeq(4), docsSeq(5))
        q.processAllAvailable()
        val stream = spark.sql("SELECT * FROM sdedup_verified")
          .as[StreamingDedup.VerifiedDup].collect()
          .map(v => (v.id_a, v.id_b, v.jaccard)).toSeq
        val batch = graft.similarity.Similarity.minhashPairs(
            docsSeq.toDF("doc_id", "text"), "doc_id", "text",
            shingleN = 3, numHashes = 32, numBands = 8, minJaccard = 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq
        // one row per pair (the batch dropDuplicates contract), and the
        // exact-jaccard VALUES agree, not just the id sets
        assert(stream.size == stream.distinct.size,
          s"pair emitted twice: ${stream.sorted}")
        assert(stream.sorted == batch.sorted,
          s"stream ${stream.sorted} != batch ${batch.sorted}")
        // sanity: the corpus exercises both exact (j=1.0) and near (j<1)
        assert(batch.exists(_._3 == 1.0) && batch.exists(_._3 < 1.0))
      } finally q.stop()
    }
  }

  test("re-delivered doc_id is not stored twice: an at-least-once source " +
      "must not multiply candidate emissions") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[StreamDoc]
      val dups = StreamingDedup.nearDupCandidates(mem.toDF())
      val q = dups.writeStream.outputMode("append")
        .format("memory").queryName("sdedup_redeliver").start()
      try {
        mem.addData(StreamDoc(1, textA))
        q.processAllAvailable()
        mem.addData(StreamDoc(1, textA)) // redelivery of the SAME doc
        q.processAllAvailable()
        mem.addData(StreamDoc(2, textA)) // a real duplicate arrives
        q.processAllAvailable()
        val out = spark.sql("SELECT * FROM sdedup_redeliver")
          .as[StreamDup].collect()
        // doc 2 collides with doc 1 once per band (8), NOT twice per band
        val twoVsOne = out.filter(d => d.doc_id == 2L && d.dup_of == 1L)
        assert(twoVsOne.length == 8,
          s"duplicate state records multiplied emissions: ${twoVsOne.length}")
      } finally q.stop()
    }
  }

  test("maxBucketSize caps per-cell state: an adversarial pileup emits " +
      "bounded candidates, not O(n^2)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[StreamDoc]
      val dups = StreamingDedup.nearDupCandidates(mem.toDF(),
        maxBucketSize = 3)
      val q = dups.writeStream.outputMode("append")
        .format("memory").queryName("sdedup_cap").start()
      try {
        // 10 identical docs: uncapped, the last would pair with 9 seen ones
        mem.addData((1 to 10).map(i => StreamDoc(i.toLong, textA)): _*)
        q.processAllAvailable()
        val out = spark.sql("SELECT * FROM sdedup_cap").as[StreamDup].collect()
        // every probe sees at most 3 stored cell-mates → ≤ 3 pairs per
        // (doc, band); with 8 bands and 10 docs: ≤ 10*8*3
        val perDocBand = out.groupBy(d => (d.doc_id, d.band))
          .map(_._2.length)
        assert(perDocBand.forall(_ <= 3),
          s"cap breached: max ${perDocBand.max} candidates in one cell probe")
        // but the duplicates are still detected (first cap-full still pairs)
        assert(out.nonEmpty)
      } finally q.stop()
    }
  }

  test("nearDupVerifiedOnce: a redelivered doc re-verifies its pairs in " +
      "the base path but emits exactly once through the pair-once gate") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // base path: redelivery re-emits (documents the at-least-once caveat)
      val memA = MemoryStream[StreamDoc]
      val qA = StreamingDedup.nearDupVerified(memA.toDF(), minJaccard = 0.5)
        .writeStream.outputMode("append")
        .format("memory").queryName("sdedup_als").start()
      // gated path: same schedule, exactly-once
      val memB = MemoryStream[StreamDoc]
      val qB = StreamingDedup.nearDupVerifiedOnce(memB.toDF(), minJaccard = 0.5)
        .writeStream.outputMode("append")
        .format("memory").queryName("sdedup_once").start()
      try {
        for (mem <- Seq(memA, memB)) {
          mem.addData(StreamDoc(1, textA), StreamDoc(2, textB))
        }
        qA.processAllAvailable(); qB.processAllAvailable()
        for (mem <- Seq(memA, memB)) mem.addData(StreamDoc(3, textA))
        qA.processAllAvailable(); qB.processAllAvailable()
        // redeliver doc 1: its cell probe re-pairs it with doc 3
        for (mem <- Seq(memA, memB)) mem.addData(StreamDoc(1, textA))
        qA.processAllAvailable(); qB.processAllAvailable()

        val als = spark.sql("SELECT * FROM sdedup_als")
          .as[StreamingDedup.VerifiedDup].collect()
          .map(v => (v.id_a, v.id_b, v.jaccard)).toSeq
        val once = spark.sql("SELECT * FROM sdedup_once")
          .as[StreamingDedup.VerifiedDup].collect()
          .map(v => (v.id_a, v.id_b, v.jaccard)).toSeq
        // the caveat is real: the base path emitted (1,3) twice
        assert(als.count(p => (p._1, p._2) == (1L, 3L)) == 2,
          s"expected the redelivery to re-verify (1,3): ${als.sorted}")
        // the gate collapses it: one row per pair, same pair SET and values
        assert(once.size == once.distinct.size, s"pair repeated: ${once.sorted}")
        assert(once.sorted == als.distinct.sorted,
          s"gated ${once.sorted} != distinct base ${als.distinct.sorted}")
        assert(once.map(p => (p._1, p._2)).toSet == Set((1L, 3L)))
      } finally { qA.stop(); qB.stop() }
    }
  }

  test("nearDupVerifiedWithIndex: stream-vs-corpus (static index) and " +
      "stream-vs-stream pairs, exactly-once, == pairsAgainstIndex on the " +
      "streamed prefix") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val corpus = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      val index = graft.similarity.IncrementalDedup
        .buildIndex(corpus, "doc_id", "text").persist()
      val mem = MemoryStream[StreamDoc]
      val q = StreamingDedup.nearDupVerifiedWithIndex(mem.toDF(), index,
          minJaccard = 0.5)
        .writeStream.outputMode("append")
        .format("memory").queryName("sdedup_idx").start()
      try {
        // batch 1: duplicates corpus doc 1 → stream-vs-INDEX pair (1,10)
        mem.addData(StreamDoc(10, textA)); q.processAllAvailable()
        // batch 2: duplicates both → adds (1,11) via index and (10,11)
        // via the stateful stream path; plus an unrelated doc
        mem.addData(StreamDoc(11, textA), StreamDoc(12, textC))
        q.processAllAvailable()
        // batch 3: REDELIVER doc 10 — nothing new may emit
        mem.addData(StreamDoc(10, textA)); q.processAllAvailable()

        val got = spark.sql("SELECT * FROM sdedup_idx")
          .as[StreamingDedup.VerifiedDup].collect()
          .map(v => (v.id_a, v.id_b, v.jaccard)).toSeq
        assert(got.size == got.distinct.size, s"pair repeated: ${got.sorted}")
        val expected = graft.similarity.IncrementalDedup.pairsAgainstIndex(
            Seq((10L, textA), (11L, textA), (12L, textC))
              .toDF("doc_id", "text"),
            index, "doc_id", "text", minJaccard = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq
        assert(got.sorted == expected.sorted,
          s"stream ${got.sorted} != batch-incremental ${expected.sorted}")
        // both paths contributed: an index pair and a stream-stream pair
        val keys = got.map(p => (p._1, p._2)).toSet
        assert(keys.contains((1L, 10L)) && keys.contains((10L, 11L)), s"$keys")
      } finally { q.stop(); index.unpersist() }
    }
  }

  test("nearDupVerifiedWithIndex: over-cap index cells are dropped " +
      "(the pileup guard binds on the static side too)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // five IDENTICAL corpus docs: every band cell for that text holds
      // all five index entries, so maxBucketSize = 4 must drop them all
      val corpus = (1L to 5L).map(i => (i, textA)).toDF("doc_id", "text")
      val index = graft.similarity.IncrementalDedup
        .buildIndex(corpus, "doc_id", "text").persist()
      try {
        def runWith(cap: Int, name: String): Seq[(Long, Long)] = {
          val mem = MemoryStream[StreamDoc]
          val q = StreamingDedup.nearDupVerifiedWithIndex(mem.toDF(), index,
              minJaccard = 0.5, maxBucketSize = cap)
            .writeStream.outputMode("append")
            .format("memory").queryName(name).start()
          try {
            mem.addData(StreamDoc(10, textA)); q.processAllAvailable()
            spark.sql(s"SELECT id_a, id_b FROM $name").collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
          } finally q.stop()
        }
        assert(runWith(cap = 4, "sdedup_capped").isEmpty,
          "hot cell must be dropped at cap 4")
        assert(runWith(cap = 64, "sdedup_uncapped")
          == (1L to 5L).map(i => (i, 10L)),
          "cap 64 must keep the 5-entry cell")
      } finally index.unpersist()
    }
  }
}
