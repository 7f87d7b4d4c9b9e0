package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.similarity.LateInteraction

/** Streaming MaxSim serving must be the batch scorer verbatim per
  * micro-batch, with the one-row-per-query token-bag contract. */
class StreamingMaxSimSpec extends SparkTestBase {
  import spark.implicits._

  test("per-batch maxsim == batch maxSimTopK across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val docVecs = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
      .localCheckpoint(true)
    // 4 queries, two tokens each, split 2+2 across micro-batches
    val qtoks = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        (qid, rows.sortBy(_.getLong(1))
          .map(_.getSeq[Float](2).toArray).toSeq) }
      .toSeq.sortBy(_._1)
    val batches = qtoks.grouped(2).toSeq

    val mem = MemoryStream[(Long, Seq[Array[Float]])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveMaxSim(
      mem.toDF().toDF("query_id", "tokens"), docVecs, k = 3) {
      (df, _) => collected ++= df.collect()
    }
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val qv = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val want = LateInteraction.maxSimTopK(qv, docVecs, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = collected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(got == want)
    assert(got.size == 12) // 4 queries x top-3
  }

  test("funnel serve == batch maxSimFunnel across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val docVecs = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
      .localCheckpoint(true)
    val qtoks = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        (qid, rows.sortBy(_.getLong(1))
          .map(_.getSeq[Float](2).toArray).toSeq) }
      .toSeq.sortBy(_._1)

    val mem = MemoryStream[(Long, Seq[Array[Float]])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveMaxSimFunnel(
      mem.toDF().toDF("query_id", "tokens"), docVecs, k = 3,
      dims = 64, shortlist = 10) {
      (df, _) => collected ++= df.collect()
    }
    try {
      qtoks.grouped(2).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val qv = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val want = LateInteraction.maxSimFunnel(qv, docVecs, k = 3, dims = 64,
        shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = collected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(got == want)
  }

  test("funnel serve through the PERSISTED pooled artifact == batch " +
      "funnel (savePooled -> serveMaxSimFunnelFromSaved, dims read from " +
      "the artifact)") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val docVecs = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
      .localCheckpoint(true)
    val path = java.nio.file.Files
      .createTempDirectory("pooled_state").toString + "/pooled"
    graft.similarity.TrainedState.savePooled(
      LateInteraction.poolSum(docVecs, "doc_id", dims = 64), path, dims = 64)
    val qtoks = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        (qid, rows.sortBy(_.getLong(1))
          .map(_.getSeq[Float](2).toArray).toSeq) }
      .toSeq.sortBy(_._1)

    val mem = MemoryStream[(Long, Seq[Array[Float]])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveMaxSimFunnelFromSaved(
      mem.toDF().toDF("query_id", "tokens"), docVecs, spark, path,
      k = 3, shortlist = 10) {
      (df, _) => collected ++= df.collect()
    }
    try {
      qtoks.grouped(2).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val qv = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val want = LateInteraction.maxSimFunnel(qv, docVecs, k = 3, dims = 64,
        shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = collected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(got == want)
  }

  test("FULLY-persisted funnel serve (pooled + tokens artifacts, no " +
      "caller-held DataFrames) == batch funnel across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val docVecs = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("funnel_art").toString
    graft.similarity.TrainedState.saveTokens(docVecs, s"$root/tokens")
    graft.similarity.TrainedState.savePooled(
      LateInteraction.poolSum(
        graft.similarity.TrainedState.loadTokens(spark, s"$root/tokens"),
        "doc_id", dims = 64), s"$root/pooled", dims = 64)
    val qtoks = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        (qid, rows.sortBy(_.getLong(1))
          .map(_.getSeq[Float](2).toArray).toSeq) }
      .toSeq.sortBy(_._1)

    val mem = MemoryStream[(Long, Seq[Array[Float]])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveMaxSimFunnelFromArtifacts(
      mem.toDF().toDF("query_id", "tokens"), spark,
      s"$root/pooled", s"$root/tokens", k = 3, shortlist = 10) {
      (df, _) => collected ++= df.collect()
    }
    try {
      qtoks.grouped(2).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val qv = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val want = LateInteraction.maxSimFunnel(qv, docVecs, k = 3, dims = 64,
        shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = collected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(got == want)
  }

  test("ANN-coarse funnel serve from artifacts: planted twin bags serve " +
      "at rank 1 / score n_tokens*1e6 through the probed IVF shortlist, " +
      "across micro-batches and a restart from the same paths") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    // 4 queries (ids 1000..1003 — the no-collision contract), 2 tokens
    // each; their bags planted verbatim as docs 100..103
    val qv = emb.filter(col("vec_id") < 8)
      .select((lit(1000L) + col("vec_id") % 4).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val twins = qv.select((col("query_id") - 900L).as("doc_id"),
      col("token_idx"), col("embedding"))
    val docVecs = emb.select((col("vec_id") % 50).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .unionByName(twins)
    val root = java.nio.file.Files.createTempDirectory("msann_art").toString
    graft.similarity.TrainedState.saveTokens(docVecs, s"$root/tokens")
    val means = LateInteraction.meanVectors(LateInteraction.poolSum(
      graft.similarity.TrainedState.loadTokens(spark, s"$root/tokens"),
      "doc_id", dims = 64))
    val cents = means.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    graft.similarity.TrainedState.saveCentroids(cents, s"$root/cents")
    graft.similarity.TrainedState.saveIvfIndex(
      graft.similarity.Similarity.ivfAssign(means, cents), s"$root/ivf")

    val qtoks = qv.collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        (qid, rows.sortBy(_.getLong(1))
          .map(_.getSeq[Float](2).toArray).toSeq) }
      .toSeq.sortBy(_._1)
    def serveAll(): Set[(Long, Int, Long, Long)] = {
      val mem = MemoryStream[(Long, Seq[Array[Float]])]
      val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = StreamingAnn.serveMaxSimAnnFromArtifacts(
        mem.toDF().toDF("query_id", "tokens"), spark,
        s"$root/ivf", s"$root/cents", s"$root/tokens",
        k = 1, dims = 64, shortlist = 4, nprobe = 3) {
        (df, _) => collected ++= df.collect()
      }
      try {
        qtoks.grouped(2).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()
      collected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    }
    val want = (0L until 4L).map(i =>
      (1000L + i, 1, 100L + i, 2000000L)).toSet
    assert(serveAll() == want)
    // restart: a second loop from the same three paths serves
    // identically — no caller-held state to re-seed
    assert(serveAll() == want)
  }
}
