package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming ANN serve must be the batch `ivfTopKWith` verbatim per
  * micro-batch — parity, cross-batch independence, and the trained-state
  * serve path. */
class StreamingAnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private lazy val centroids = graft.similarity.KMeans.fit(
    emb.filter(col("vec_id") % 2 === 0), k = 8, iters = 1)
    .localCheckpoint(true)

  test("per-batch results == batch ivfTopKWith on the same queries, " +
      "across multiple micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val queryIds = Seq(Seq(1L, 3L), Seq(5L), Seq(7L, 9L, 11L))
    val qVecs = emb.filter(col("vec_id") < 12).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveIvf(
      mem.toDF().toDF("vec_id", "embedding"), emb, centroids,
      k = 3, nprobe = 2) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = graft.similarity.Similarity.ivfTopKWith(
      emb.filter(col("vec_id") < 12).filter(col("vec_id") % 2 === 1),
      emb, k = 3, centroidsDf = centroids, nprobe = 2).collect()
    // (query_id, rank) -> (neighbor_id, cos) — ranks must agree too
    def keyed(rows: Seq[Row]): Map[(Long, Int), (Long, Double)] =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("serveGraph: streamed beam search == batch searchGraph across " +
      "micro-batches, through the persisted graph artifact") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 60).localCheckpoint(true)
    val edges = graft.similarity.Similarity.bruteTopK(corpus, corpus, 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_gserve").toString + "/graph"
    graft.similarity.TrainedState.saveGraphIndex(edges, path)
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 9L))
    val qVecs = emb.filter(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveGraphFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), corpus, path,
      entryId = 0L, beam = 3, hops = 2, k = 3) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.GraphAnn.searchGraph(
      emb.filter(col("vec_id").isin(1L, 3L, 5L, 9L)),
      graft.similarity.TrainedState.loadGraphIndex(spark, path), corpus,
      entryId = 0L, beam = 3, hops = 2, k = 3).collect()
    def keyed(rows: Seq[Row]): Map[(Long, Int), (Long, Double)] =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed graph top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("serveGraphPq: streamed DiskANN-style serving through ALL THREE " +
      "persisted artifacts == batch searchGraphPq across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 60).localCheckpoint(true)
    val edges = graft.similarity.Similarity.bruteTopK(corpus, corpus, 4)
      .localCheckpoint(true)
    val books = graft.similarity.ProductQuantizer.codebooks(
      corpus, 64, 4, 10)
    val codes = graft.similarity.ProductQuantizer.encode(
      corpus, books, 64, 4).localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gpq_serve").toString
    graft.similarity.TrainedState.saveGraphIndex(edges, s"$dir/graph")
    graft.similarity.TrainedState.savePqCodes(codes, s"$dir/codes")
    graft.similarity.TrainedState.saveCodebooks(books, s"$dir/books")
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 9L))
    val qVecs = emb.filter(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveGraphPqFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), corpus, s"$dir/graph",
      s"$dir/codes", s"$dir/books", dim = 64, numSub = 4, entryId = 0L,
      beam = 6, hops = 3, k = 2, rerank = 4) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.GraphAnn.searchGraphPq(
      emb.filter(col("vec_id").isin(1L, 3L, 5L, 9L)), edges, codes,
      books, 64, 4, corpus, entryId = 0L, beam = 6, hops = 3, k = 2,
      rerank = 4).collect()
    def keyed(rows: Seq[Row]): Map[(Long, Int), (Long, Double)] =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed graph-PQ top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("serveHnswPq: streamed DiskANN-LAYERED serving through ALL " +
      "THREE persisted artifacts == batch Hnsw.searchPq across " +
      "micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val layered = graft.similarity.Hnsw.buildIndex(corpus, degree = 4,
      m = 4, maxLevel = 2).localCheckpoint(true)
    val books = graft.similarity.ProductQuantizer.codebooks(
      corpus, 64, 4, 10)
    val codes = graft.similarity.ProductQuantizer.encode(
      corpus, books, 64, 4).localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hpq_serve").toString
    graft.similarity.TrainedState.saveHnswIndex(layered, s"$dir/hnsw")
    graft.similarity.TrainedState.savePqCodes(codes, s"$dir/codes")
    graft.similarity.TrainedState.saveCodebooks(books, s"$dir/books")
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 9L))
    val qVecs = emb.filter(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveHnswPqFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), corpus, s"$dir/hnsw",
      s"$dir/codes", s"$dir/books", dim = 64, numSub = 4,
      beamUpper = 1, hopsUpper = 2, beam = 4, hops = 3, k = 2,
      rerank = 4) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val (entryId, entryLevel) = graft.similarity.Hnsw.entryOf(
      graft.similarity.Hnsw.levels(corpus, m = 4, maxLevel = 2))
    val batchRef = graft.similarity.Hnsw.searchPq(
      emb.filter(col("vec_id").isin(1L, 3L, 5L, 9L)),
      graft.similarity.TrainedState.loadHnswIndex(spark, s"$dir/hnsw"),
      codes, books, 64, 4, corpus, entryId, entryLevel, beamUpper = 1,
      hopsUpper = 2, beam = 4, hops = 3, k = 2, rerank = 4).collect()
    def keyedP(rows: Seq[Row]): Map[(Long, Int), (Long, Double)] =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyedP(collected.toSeq) == keyedP(batchRef.toSeq),
      "streamed layered-PQ top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("serveOpq: streamed trained-OPQ serving through BOTH persisted " +
      "artifacts == batch topKOpq across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 60).localCheckpoint(true)
    val rot = graft.similarity.Opq.trainRotation(corpus, dim = 64,
      numSub = 4, k = 8, kmeansIters = 1, opqIters = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_opq_serve").toString
    graft.similarity.TrainedState.saveRotation(spark, rot, s"$dir/rot")
    graft.similarity.TrainedState.saveCodebooks(
      graft.similarity.ProductQuantizer.codebooksKMeans(
        graft.similarity.Opq.applyRotation(corpus, rot), 64, 4, 8, 1),
      s"$dir/books")
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 9L))
    val qVecs = emb.filter(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveOpq(
      mem.toDF().toDF("vec_id", "embedding"), corpus, s"$dir/rot",
      s"$dir/books", dim = 64, numSub = 4, k = 2, rerank = 8) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.Opq.topKOpq(
      emb.filter(col("vec_id").isin(1L, 3L, 5L, 9L)), corpus, 64, 4,
      k = 2,
      rot = graft.similarity.TrainedState.loadRotation(spark, s"$dir/rot"),
      booksDf = graft.similarity.TrainedState.loadCodebooks(spark,
        s"$dir/books"), rerank = 8).collect()
    def keyed(rows: Seq[Row]): Map[(Long, Int), (Long, Double)] =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed OPQ top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("buildGraph: streamed index construction == batch-sequential " +
      "insertBySearch at the same batch boundaries; redelivery replaces") {
    implicit val sqlCtx = spark.sqlContext
    val seed = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = seed.count().toInt
    val seedEdges = graft.similarity.Similarity.bruteTopK(seed, seed, 4)
      .localCheckpoint(true)
    val arrivals = emb.filter(col("vec_id") >= 30 && col("vec_id") < 38)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batches = Seq(Seq(30L, 31L, 32L), Seq(33L, 34L), Seq(35L, 36L, 37L))

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    // streamed build
    val mem = MemoryStream[(Long, Seq[Float])]
    var streamed: Set[(Long, Int, Long, Double)] = Set.empty
    val q = StreamingAnn.buildGraph(
      mem.toDF().toDF("vec_id", "embedding"), seed, seedEdges,
      entryId = 0L, beam = n + 8, hops = n, degree = 4) { (df, _) =>
      streamed = rows(df)
    }
    try {
      batches.foreach { b =>
        mem.addData(b.map(id => id -> arrivals(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // batch-sequential reference at the same boundaries
    var corpus = seed
    var edges = seedEdges
    batches.foreach { b =>
      val batch = spark.createDataset(b.map(id => id -> arrivals(id)))
        .toDF("vec_id", "embedding").localCheckpoint(true)
      edges = graft.similarity.GraphAnn.insertBySearch(edges, corpus,
        batch, entryId = 0L, beam = n + 8, hops = n, degree = 4)
        .localCheckpoint(true)
      corpus = corpus.unionByName(batch).localCheckpoint(true)
    }
    assert(streamed === rows(edges),
      "streamed graph diverged from batch-sequential insertion")

    // identical redelivery converges to the same edge state
    val mem2 = MemoryStream[(Long, Seq[Float])]
    var after: Set[(Long, Int, Long, Double)] = Set.empty
    val q2 = StreamingAnn.buildGraph(
      mem2.toDF().toDF("vec_id", "embedding"), seed, seedEdges,
      entryId = 0L, beam = n + 8, hops = n, degree = 4) { (df, _) =>
      after = rows(df)
    }
    try {
      mem2.addData(Seq(30L, 31L).map(id => id -> arrivals(id)): _*)
      q2.processAllAvailable()
      val once = after
      mem2.addData(Seq(30L, 31L).map(id => id -> arrivals(id)): _*)
      q2.processAllAvailable()
      assert(after === once,
        "identical redelivery changed the edge state")
    } finally q2.stop()
  }

  test("buildGraphPersisted: a long fold-in stream keeps the artifact's " +
      "generation count bounded by POLICY (compactIfNeeded fires inside " +
      "the loop), converges to the batch-sequential edge state, and " +
      "rejects redelivery loudly") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val seed = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = seed.count().toInt
    val seedEdges = graft.similarity.Similarity.bruteTopK(seed, seed, 4)
      .localCheckpoint(true)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_bgp").toString + "/idx"
    TS.saveGraphIndex(seedEdges, idxPath)
    val arrivals = emb.filter(col("vec_id") >= 30 && col("vec_id") < 39)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batches = Seq(Seq(30L, 31L), Seq(32L), Seq(33L, 34L), Seq(35L),
      Seq(36L, 37L), Seq(38L))

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    val mem = MemoryStream[(Long, Seq[Float])]
    val gensSeen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingAnn.buildGraphPersisted(
      mem.toDF().toDF("vec_id", "embedding"), seed, idxPath,
      entryId = 0L, beam = n + 10, hops = n, degree = 4,
      maxGenerations = 2L) { (_, _) =>
      gensSeen += TS.deltaGenerations(spark, idxPath)
    }
    try {
      batches.foreach { b =>
        mem.addData(b.map(id => id -> arrivals(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // the POLICY claim: compaction fired inside the loop (the count
    // drops between triggers), no observation ever EXCEEDS the
    // threshold (sink observes post-append, pre-compact), and the
    // final artifact is compacted — the fleet needs no human compactor
    assert(gensSeen.size == batches.size)
    assert(gensSeen.forall(_ <= 2L),
      s"generation count must never exceed maxGenerations=2: $gensSeen")
    assert(gensSeen.sliding(2).exists(p => p.last < p.head),
      s"at least one in-loop compaction must fire: $gensSeen")
    assert(TS.deltaGenerations(spark, idxPath) == 0L,
      "the threshold-reaching final append must have compacted")

    // durability + parity: the ARTIFACT (deltas reconciled) equals the
    // batch-sequential in-memory lifecycle at the same boundaries
    var corpus = seed
    var edges = seedEdges
    batches.foreach { b =>
      val batch = spark.createDataset(b.map(id => id -> arrivals(id)))
        .toDF("vec_id", "embedding").localCheckpoint(true)
      edges = graft.similarity.GraphAnn.insertBySearch(edges, corpus,
        batch, entryId = 0L, beam = n + 10, hops = n, degree = 4)
        .localCheckpoint(true)
      corpus = corpus.unionByName(batch).localCheckpoint(true)
    }
    assert(rows(TS.loadGraphIndex(spark, idxPath)) === rows(edges),
      "persisted fold-in stream diverged from batch-sequential insertion")

    // redelivery rejects loudly (the delta model cannot delete rows)
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StreamingAnn.buildGraphPersisted(
      mem2.toDF().toDF("vec_id", "embedding"),
      corpus.localCheckpoint(true), idxPath,
      entryId = 0L, beam = n + 10, hops = n, degree = 4)()
    try {
      mem2.addData(30L -> arrivals(30L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(ex.getMessage.contains("redelivered") ||
        Option(ex.getCause).exists(_.getMessage.contains("redelivered")))
    } finally q2.stop()
  }

  test("buildGraphPersisted: the corpus side is a PERSISTED artifact — " +
      "a restart with an EMPTY seed resumes from it (no reseed, " +
      "redelivery memory intact across the restart), the artifact " +
      "accumulates exactly seed+batches, and its generations stay " +
      "bounded by the same policy") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val seed = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = seed.count().toInt
    val seedEdges = graft.similarity.Similarity.bruteTopK(seed, seed, 4)
      .localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("graft_bgp_restart").toString
    val idxPath = s"$root/idx"
    val vecPath = s"$root/idx.vectors" // the default derived path
    TS.saveGraphIndex(seedEdges, idxPath)
    val arrivals = emb.filter(col("vec_id") >= 30 && col("vec_id") < 36)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    // run 1: seeded — folds two batches
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.buildGraphPersisted(
      mem.toDF().toDF("vec_id", "embedding"), seed, idxPath,
      entryId = 0L, beam = n + 10, hops = n, degree = 4,
      maxGenerations = 2L)()
    try {
      Seq(Seq(30L, 31L), Seq(32L)).foreach { b =>
        mem.addData(b.map(id => id -> arrivals(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(new java.io.File(vecPath).exists(),
      "the corpus artifact must exist beside the index")

    // run 2: RESTART with an empty seed — resumes from the artifact
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StreamingAnn.buildGraphPersisted(
      mem2.toDF().toDF("vec_id", "embedding"), seed.limit(0), idxPath,
      entryId = 0L, beam = n + 10, hops = n, degree = 4,
      maxGenerations = 2L)()
    try {
      Seq(Seq(33L, 34L), Seq(35L)).foreach { b =>
        mem2.addData(b.map(id => id -> arrivals(id)): _*)
        q2.processAllAvailable()
      }
    } finally q2.stop()

    // parity across the restart: artifact == batch-sequential insertion
    // over ALL batches at the same boundaries
    var corpus = seed
    var edges = seedEdges
    Seq(Seq(30L, 31L), Seq(32L), Seq(33L, 34L), Seq(35L)).foreach { b =>
      val batch = spark.createDataset(b.map(id => id -> arrivals(id)))
        .toDF("vec_id", "embedding").localCheckpoint(true)
      edges = graft.similarity.GraphAnn.insertBySearch(edges, corpus,
        batch, entryId = 0L, beam = n + 10, hops = n, degree = 4)
        .localCheckpoint(true)
      corpus = corpus.unionByName(batch).localCheckpoint(true)
    }
    assert(rows(TS.loadGraphIndex(spark, idxPath)) === rows(edges),
      "restarted fold-in diverged from batch-sequential insertion")
    // the corpus artifact accumulated exactly seed + every batch
    assert(TS.loadVectors(spark, vecPath).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet ===
      ((0L until 30L) ++ (30L to 35L)).toSet)
    // its generation count obeys the same policy
    assert(TS.deltaGenerations(spark, vecPath) <= 2L)

    // redelivery memory survives the restart: an id folded BEFORE the
    // restart rejects in a fresh empty-seeded run — the artifact, not
    // the in-memory union, is the memory
    val mem3 = MemoryStream[(Long, Seq[Float])]
    val q3 = StreamingAnn.buildGraphPersisted(
      mem3.toDF().toDF("vec_id", "embedding"), seed.limit(0), idxPath,
      entryId = 0L, beam = n + 10, hops = n, degree = 4)()
    try {
      mem3.addData(30L -> arrivals(30L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      assert(ex.getMessage.contains("redelivered") ||
        Option(ex.getCause).exists(_.getMessage.contains("redelivered")))
    } finally q3.stop()
  }

  test("buildGraphPersisted: per-trigger scheduler work does not grow " +
      "with the accumulated corpus — job counts stay flat across a run " +
      "that grows the artifact trigger over trigger (no full-corpus " +
      "re-materialization anywhere in the loop)") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val seed = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = seed.count().toInt
    val seedEdges = graft.similarity.Similarity.bruteTopK(seed, seed, 4)
      .localCheckpoint(true)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_bgp_jobs").toString + "/idx"
    TS.saveGraphIndex(seedEdges, idxPath)
    val arrivals = emb.filter(col("vec_id") >= 30 && col("vec_id") < 42)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // 12 single-vector triggers: if any per-trigger step re-touched
    // the accumulated corpus eagerly (the pre-r15 per-trigger
    // unionByName(batch).localCheckpoint), job counts would still be
    // flat but the old checkpoint JOB grew with the corpus — what CAN
    // drift with corpus growth under the artifact design is only the
    // reconcile's bounded delta handling, so the job count per trigger
    // must stay exactly periodic once warm (maxGenerations high enough
    // that no compaction fires mid-run)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val perTrigger = scala.collection.mutable.ArrayBuffer.empty[Int]
    spark.sparkContext.addSparkListener(listener)
    try {
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = StreamingAnn.buildGraphPersisted(
        mem.toDF().toDF("vec_id", "embedding"), seed, idxPath,
        entryId = 0L, beam = n + 12, hops = n, degree = 4,
        maxGenerations = 100L)()
      try {
        (30L until 42L).foreach { id =>
          mem.addData(id -> arrivals(id))
          val before = jobs.get()
          q.processAllAvailable()
          perTrigger += jobs.get() - before
        }
      } finally q.stop()
    } finally spark.sparkContext.removeSparkListener(listener)
    // drop the first two triggers (fingerprint-cache warmup, lazy
    // inits). The walk's hop count can vary by a hop or two with the
    // batch's geometry, so "flat" is a tight band + no growth trend —
    // corpus grew 40% across the window, so any O(corpus) stage would
    // show as a drift between the halves
    val steady = perTrigger.drop(2)
    assert(steady.nonEmpty && steady.max - steady.min <= 4,
      s"per-trigger job counts must stay in a tight band across a " +
        s"growing run: $perTrigger")
    assert(steady.takeRight(4).sum <= steady.take(4).sum + 4,
      s"per-trigger job counts trend upward with corpus growth: " +
        s"$perTrigger")
  }

  test("buildHnswPersisted: the layered fold-in loop keeps generations " +
      "bounded by policy and the artifact converges to the " +
      "batch-sequential Hnsw.insert state") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val seed = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = seed.count().toInt
    val seedLayered = graft.similarity.Hnsw.buildIndex(seed, degree = 4,
      m = 4, maxLevel = 2).localCheckpoint(true)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_bhp").toString + "/idx"
    TS.saveHnswIndex(seedLayered, idxPath)
    val arrivals = emb.filter(col("vec_id") >= 30 && col("vec_id") < 36)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batches = Seq(Seq(30L, 31L), Seq(32L), Seq(33L), Seq(34L, 35L))

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), BigDecimal(r.getDouble(4)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    val mem = MemoryStream[(Long, Seq[Float])]
    val gensSeen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingAnn.buildHnswPersisted(
      mem.toDF().toDF("vec_id", "embedding"), seed, idxPath,
      m = 4, maxLevel = 2, beam = n + 10, hops = n, degree = 4,
      maxGenerations = 2L) { (_, _) =>
      gensSeen += TS.deltaGenerations(spark, idxPath)
    }
    try {
      batches.foreach { b =>
        mem.addData(b.map(id => id -> arrivals(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(gensSeen.size == batches.size)
    assert(gensSeen.forall(_ <= 2L),
      s"generation count must never exceed maxGenerations=2: $gensSeen")
    assert(gensSeen.sliding(2).exists(p => p.last < p.head),
      s"at least one in-loop compaction must fire: $gensSeen")
    assert(TS.deltaGenerations(spark, idxPath) == 0L,
      "the threshold-reaching final append must have compacted")

    var corpus = seed
    var layered = seedLayered
    batches.foreach { b =>
      val batch = spark.createDataset(b.map(id => id -> arrivals(id)))
        .toDF("vec_id", "embedding").localCheckpoint(true)
      layered = graft.similarity.Hnsw.insert(layered, batch, corpus,
        m = 4, maxLevel = 2, beam = n + 10, hops = n, degree = 4)
        .localCheckpoint(true)
      corpus = corpus.unionByName(batch).localCheckpoint(true)
    }
    assert(rows(TS.loadHnswIndex(spark, idxPath).select(col("layer"),
        col("query_id"), col("rank"), col("neighbor_id"),
        col("cos_sim"))) ===
      rows(layered.select(col("layer"), col("query_id"), col("rank"),
        col("neighbor_id"), col("cos_sim"))),
      "persisted layered fold-in diverged from batch-sequential insert")
  }

  test("buildHnsw: streamed layered construction == batch-sequential " +
      "Hnsw.insert at the same batch boundaries; redelivery replaces " +
      "at every layer") {
    implicit val sqlCtx = spark.sqlContext
    val seed = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = seed.count().toInt
    val seedLayered = graft.similarity.Hnsw.buildIndex(seed, degree = 4,
      m = 4, maxLevel = 2).localCheckpoint(true)
    val arrivals = emb.filter(col("vec_id") >= 30 && col("vec_id") < 38)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batches = Seq(Seq(30L, 31L, 32L), Seq(33L, 34L), Seq(35L, 36L, 37L))

    def rowsL(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), BigDecimal(r.getDouble(4)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet

    val mem = MemoryStream[(Long, Seq[Float])]
    var streamed: Set[(Int, Long, Int, Long, Double)] = Set.empty
    val q = StreamingAnn.buildHnsw(
      mem.toDF().toDF("vec_id", "embedding"), seed, seedLayered,
      m = 4, maxLevel = 2, beam = n + 8, hops = n, degree = 4) {
      (df, _) => streamed = rowsL(df)
    }
    try {
      batches.foreach { b =>
        mem.addData(b.map(id => id -> arrivals(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    var corpus = seed
    var layered = seedLayered
    batches.foreach { b =>
      val batch = spark.createDataset(b.map(id => id -> arrivals(id)))
        .toDF("vec_id", "embedding").localCheckpoint(true)
      layered = graft.similarity.Hnsw.insert(layered, batch, corpus,
        m = 4, maxLevel = 2, beam = n + 8, hops = n, degree = 4)
        .localCheckpoint(true)
      corpus = corpus.unionByName(batch).localCheckpoint(true)
    }
    assert(streamed === rowsL(layered),
      "streamed layered index diverged from batch-sequential insertion")

    // identical redelivery converges to the same layered state
    val mem2 = MemoryStream[(Long, Seq[Float])]
    var after: Set[(Int, Long, Int, Long, Double)] = Set.empty
    val q2 = StreamingAnn.buildHnsw(
      mem2.toDF().toDF("vec_id", "embedding"), seed, seedLayered,
      m = 4, maxLevel = 2, beam = n + 8, hops = n, degree = 4) {
      (df, _) => after = rowsL(df)
    }
    try {
      mem2.addData(Seq(30L, 31L).map(id => id -> arrivals(id)): _*)
      q2.processAllAvailable()
      val once = after
      mem2.addData(Seq(30L, 31L).map(id => id -> arrivals(id)): _*)
      q2.processAllAvailable()
      assert(after === once,
        "identical redelivery changed the layered state")
    } finally q2.stop()
  }

  test("serveMrl: streamed two-stage funnel == batch mrlTopK across " +
      "micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 7L))
    val qVecs = emb.filter(col("vec_id") < 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveMrl(
      mem.toDF().toDF("vec_id", "embedding"), emb, k = 3, dims = 16,
      shortlist = 10) { (df, _) => collected ++= df.collect() }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val want = graft.similarity.Similarity.mrlTopK(
        emb.filter(col("vec_id").isin(queryIds.flatten: _*)), emb,
        k = 3, dims = 16, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val got = collected.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(got == want)
    assert(got.size == 12) // 4 queries x top-3
  }

  test("serveQuant: per-batch results == batch topKQuantWith against the " +
      "same pre-built index, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 100)
    // built once, persisted — the serve-many contract
    val index = graft.similarity.Quantize.buildIndex(corpus)
      .localCheckpoint(true)
    val qVecs = emb.filter(col("vec_id") < 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveQuant(
      mem.toDF().toDF("vec_id", "embedding"), index, corpus, k = 3) {
      (df, _) => collected ++= df.collect()
    }
    try {
      Seq(Seq(1L, 3L), Seq(5L, 7L)).foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = graft.similarity.Quantize.topKQuantWith(
      emb.filter(col("vec_id").isin(1L, 3L, 5L, 7L)), index, corpus, k = 3)
      .collect()
    // all five columns must agree, including the coarse qdot
    def keyed(rows: Seq[Row]): Map[(Long, Int), (Long, Double, Double)] =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2),
          BigDecimal(r.getDouble(3)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(r.getDouble(4)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq),
      "streamed quantized top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("foldInIvf: streamed fold-in grows the persisted index to exactly " +
      "the batch-built one (probe parity); batch-id replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sivf")
      .toString + "/idx"
    // seed: the initial batch-built corpus as its own batch directory
    val seed = emb.filter(col("vec_id") >= 100 && col("vec_id") < 300)
      .localCheckpoint(true)
    StreamingAnn.foldBatch(centroids, dir)(seed, -1L)
    val vecs = emb.filter(col("vec_id") < 100).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.foldInIvf(mem.toDF().toDF("vec_id", "embedding"),
      centroids, dir)
    try {
      Seq(0L until 50L, 50L until 100L).foreach { ids =>
        mem.addData(ids.map(id => id -> vecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val loaded = graft.similarity.TrainedState.loadIvfIndex(spark, dir)
      .localCheckpoint(true)
    val rebuilt = graft.similarity.Similarity.ivfAssign(
      emb.filter(col("vec_id") < 300), centroids).localCheckpoint(true)
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loaded.count() == 300)
    assert(cells(loaded) == cells(rebuilt),
      "streamed index cell assignments diverged from batch build")
    // probe parity through the persisted streamed index
    val queries = emb.filter(col("vec_id") < 10)
    def keyedProbe(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(
      keyedProbe(graft.similarity.Similarity.ivfTopKFromIndex(queries,
        loaded, k = 3, centroids, nprobe = 2)) ==
      keyedProbe(graft.similarity.Similarity.ivfTopKFromIndex(queries,
        rebuilt, k = 3, centroids, nprobe = 2)),
      "probe through streamed index diverged")
    // REPLAY batch 0 (same id, same content): overwrite, not append
    val batch0 = emb.filter(col("vec_id") < 50)
    StreamingAnn.foldBatch(centroids, dir)(batch0, 0L)
    assert(graft.similarity.TrainedState.loadIvfIndex(spark, dir)
      .count() == 300, "batch-id replay duplicated rows")
  }

  test("serveSemanticDedup: per-batch admission decisions == the batch " +
      "semanticDedupAgainstIndex on the same vectors") {
    implicit val sqlCtx = spark.sqlContext
    val index = graft.similarity.Similarity.ivfAssign(emb, centroids)
      .localCheckpoint(true)
    // planted copies (guaranteed dups) + far-id clean vectors re-planted
    // under fresh ids (dup of their source — also refused): every
    // decision is knowable, and batches exercise both outcomes
    val src = emb.filter(col("vec_id") < 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batches = Seq(Seq(0L, 1L), Seq(2L, 3L, 4L))

    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveSemanticDedup(
      mem.toDF().toDF("vec_id", "embedding"), index, centroids,
      threshold = 0.9999) { (df, _) => collected ++= df.collect() }
    try {
      batches.foreach { b =>
        mem.addData(b.map(id => (id + 1000000L) -> src(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = batches.flatMap { b =>
      val batchDf = b.map(id => (id + 1000000L) -> src(id))
        .toDF("vec_id", "embedding").repartition(2)
      graft.similarity.Similarity.semanticDedupAgainstIndex(
        batchDf, index, centroids, 0.9999).collect()
    }
    def keyed(rows: Seq[Row]) = rows.map(r => r.getLong(0) ->
      (r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef))
    // and the contract itself: every copy refused, traced to its source
    assert(keyed(collected.toSeq) ==
      batches.flatten.map(id => (id + 1000000L) -> ((true, id))).toMap)
  }

  test("serveKnnClassify: streamed predictions == the batch classify " +
      "plan; null-labeled index rows never vote") {
    implicit val sqlCtx = spark.sqlContext
    val full = graft.Tables.load(spark, sfDir, "embeddings")
      // every 7th corpus label masked — ranks as a neighbor, never votes
      .select(col("vec_id"), col("embedding"),
        when(pmod(col("vec_id"), lit(7)) === 0, lit(null))
          .otherwise(col("label")).as("label"))
    val index = graft.similarity.Similarity
      .ivfAssignWith(full, centroids, Seq("label")).localCheckpoint(true)
    val qVecs = full.filter(col("vec_id") < 12).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveKnnClassify(
      mem.toDF().toDF("vec_id", "embedding"), index, centroids,
      k = 5, nprobe = 2) { (df, _) => collected ++= df.collect() }
    try {
      Seq(Seq(1L, 3L), Seq(5L, 7L)).foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = StreamingAnn.classifyBatch(index, centroids, 5, 2)(
      full.filter(col("vec_id").isin(1L, 3L, 5L, 7L))
        .select("vec_id", "embedding")).collect()
    def keyed(rows: Seq[Row]) =
      rows.map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq))
    assert(collected.nonEmpty)
    // a masked-label vector must not appear as a vote source: with k=5
    // votes per query, n_labeled <= 5 always, and every prediction is a
    // real label value
    assert(collected.forall(r => r.getLong(3) <= 5L))
  }

  test("serveFiltered: streamed filtered top-k == the batch " +
      "ivfTopKFiltered plan with precomputed cell counts") {
    implicit val sqlCtx = spark.sqlContext
    val full = graft.Tables.load(spark, sfDir, "embeddings")
    val index = graft.similarity.Similarity
      .ivfAssignWith(full, centroids, Seq("label")).localCheckpoint(true)
    val pred = col("label") === 3
    val counts = graft.similarity.Similarity.ivfCellCounts(index, pred)
      .localCheckpoint(true)
    val qVecs = full.filter(col("vec_id") < 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveFiltered(
      mem.toDF().toDF("vec_id", "embedding"), index, pred, 3,
      centroids, minCandidates = 12, cellCounts = Some(counts)) {
      (df, _) => collected ++= df.collect()
    }
    try {
      Seq(Seq(0L, 2L), Seq(4L, 6L)).foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = graft.similarity.Similarity.ivfTopKFiltered(
      full.filter(col("vec_id").isin(0L, 2L, 4L, 6L))
        .select("vec_id", "embedding"),
      index, pred, 3, centroids, 12, Some(counts)).collect()
    def keyed(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed(collected.toSeq) == keyed(batchRef.toSeq))
    assert(collected.nonEmpty)
  }

  test("serveBq: streamed binary-quantized top-k == batch topKBinary " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 7L))
    val qVecs = emb.filter(col("vec_id") < 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveBq(
      mem.toDF().toDF("vec_id", "embedding"), emb, dim = 64, k = 3,
      rerank = 8) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.BinaryQuantize.topKBinary(
      emb.filter(col("vec_id") < 8).filter(col("vec_id") % 2 === 1),
      emb, dim = 64, k = 3, rerank = 8).collect()
    def keyedB(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyedB(collected.toSeq) == keyedB(batchRef.toSeq))
    assert(collected.nonEmpty)
  }

  test("serveIvfPqFromSaved: streamed IVF-PQ through ALL persisted " +
      "artifacts == batch topKFromIndex across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stride = graft.similarity.ProductQuantizer.codebooks(
      emb, dim = 64, numSub = 8, stride = 25)
    val cells = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val root = java.nio.file.Files.createTempDirectory("ivfpq_serve").toString
    graft.similarity.TrainedState.saveCentroids(cells, s"$root/cells")
    graft.similarity.TrainedState.saveCodebooks(stride, s"$root/books")
    graft.similarity.TrainedState.saveIvfPqIndex(
      graft.similarity.IvfPq.encode(emb, cells, stride, dim = 64,
        numSub = 8), s"$root/idx")

    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 7L))
    val qVecs = emb.filter(col("vec_id") < 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveIvfPqFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), emb, spark,
      s"$root/idx", s"$root/cells", s"$root/books",
      dim = 64, numSub = 8, k = 3, nprobe = 2, rerank = 8) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRef = graft.similarity.IvfPq.topKFromIndex(
      emb.filter(col("vec_id") < 8).filter(col("vec_id") % 2 === 1),
      graft.similarity.TrainedState.loadIvfPqIndex(spark, s"$root/idx"),
      emb, k = 3, cells, stride, dim = 64, numSub = 8, nprobe = 2,
      rerank = 8).collect()
    def keyed2(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyed2(collected.toSeq) == keyed2(batchRef.toSeq))
    assert(collected.nonEmpty)
  }

  test("serveHnsw: streamed hierarchical search through the persisted " +
      "layered artifact == batch Hnsw.searchAuto across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = emb.filter(col("vec_id") < 100).localCheckpoint(true)
    val layered = graft.similarity.Hnsw.buildIndex(corpus, degree = 4,
      m = 4, maxLevel = 2).localCheckpoint(true)
    val path = java.nio.file.Files
      .createTempDirectory("graft_hserve").toString + "/hnsw"
    graft.similarity.TrainedState.saveHnswIndex(layered, path)
    val queryIds = Seq(Seq(1L, 3L), Seq(5L, 9L))
    val qVecs = emb.filter(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveHnswFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), corpus, path,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { batch =>
        mem.addData(batch.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.Hnsw.searchAuto(
      emb.filter(col("vec_id").isin(1L, 3L, 5L, 9L)),
      graft.similarity.TrainedState.loadHnswIndex(spark, path), corpus,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3).collect()
    def keyedH(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyedH(collected.toSeq) == keyedH(batchRef.toSeq),
      "streamed HNSW top-k diverged from the batch plan")
    assert(collected.nonEmpty)
  }

  test("serveHnswFromSaved over a DELTA-APPENDED artifact: the load " +
      "reconciles generations, so streamed serving == batch searchAuto " +
      "over the in-memory updated index — the restart path of the " +
      "fold-in write") {
    implicit val sqlCtx = spark.sqlContext
    val pre = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val batch = emb.filter(col("vec_id") >= 80 && col("vec_id") < 90)
      .localCheckpoint(true)
    val layered = graft.similarity.Hnsw.buildIndex(pre, degree = 4,
      m = 4, maxLevel = 2).localCheckpoint(true)
    val path = java.nio.file.Files
      .createTempDirectory("graft_hdserve").toString + "/hnsw"
    graft.similarity.TrainedState.saveHnswIndex(layered, path)
    val (fullRaw, delta) = graft.similarity.Hnsw.insertWithDelta(
      layered, batch, pre, m = 4, maxLevel = 2, beam = 3, hops = 2,
      degree = 4)
    val full = fullRaw.localCheckpoint(true)
    graft.similarity.TrainedState.appendHnswDelta(delta, path)
    val corpus = pre.unionByName(batch).localCheckpoint(true)
    val queryIds = Seq(Seq(1L, 83L), Seq(5L, 87L)) // incl. NEW vectors
    val qVecs = corpus.filter(col("vec_id") < 10 ||
        col("vec_id") >= 80).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveHnswFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), corpus, path,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { b =>
        mem.addData(b.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.Hnsw.searchAuto(
      corpus.filter(col("vec_id").isin(1L, 83L, 5L, 87L)), full, corpus,
      beamUpper = 1, hopsUpper = 2, beam = 3, hops = 2, k = 3).collect()
    def keyedD(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyedD(collected.toSeq) == keyedD(batchRef.toSeq),
      "delta-served HNSW diverged from the in-memory updated index")
    assert(collected.nonEmpty)
  }

  test("serveGraphFromSaved through a delta-appended FLAT graph: the " +
      "load reconciles appendGraphDelta generations, so streamed " +
      "serving == batch searchGraph over the in-memory updated edges — " +
      "the flat artifact's restart path of the fold-in write") {
    implicit val sqlCtx = spark.sqlContext
    val pre = emb.filter(col("vec_id") < 80).localCheckpoint(true)
    val batch = emb.filter(col("vec_id") >= 80 && col("vec_id") < 90)
      .localCheckpoint(true)
    val edges = graft.similarity.Similarity.bruteTopK(pre, pre, 4)
      .localCheckpoint(true)
    val path = java.nio.file.Files
      .createTempDirectory("graft_gdserve").toString + "/graph"
    graft.similarity.TrainedState.saveGraphIndex(edges, path)
    val (untouched, changed) = graft.similarity.GraphAnn
      .insertBySearchParts(edges, pre, batch, entryId = 0L, beam = 6,
        hops = 4, degree = 4)
    val full = untouched.unionByName(changed).localCheckpoint(true)
    graft.similarity.TrainedState.appendGraphDelta(changed, path)
    val corpus = pre.unionByName(batch).localCheckpoint(true)
    val queryIds = Seq(Seq(1L, 83L), Seq(5L, 87L)) // incl. NEW vectors
    val qVecs = corpus.filter(col("vec_id") < 10 ||
        col("vec_id") >= 80).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingAnn.serveGraphFromSaved(
      mem.toDF().toDF("vec_id", "embedding"), corpus, path,
      entryId = 0L, beam = 4, hops = 3, k = 3) { (df, _) =>
      collected ++= df.collect()
    }
    try {
      queryIds.foreach { b =>
        mem.addData(b.map(id => id -> qVecs(id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchRef = graft.similarity.GraphAnn.searchGraph(
      corpus.filter(col("vec_id").isin(1L, 83L, 5L, 87L)), full, corpus,
      entryId = 0L, beam = 4, hops = 3, k = 3).collect()
    def keyedD(rows: Seq[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), BigDecimal(r.getDouble(3)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(keyedD(collected.toSeq) == keyedD(batchRef.toSeq),
      "delta-served flat graph diverged from the in-memory updated edges")
    assert(collected.nonEmpty)
  }

  test("forgetGraphPersisted: streamed deletions tombstone the vectors " +
      "artifact (serve excludes them immediately), the entry id is " +
      "protected, consolidation repairs the edge base to " +
      "as-if-never-ingested, and a forgotten id is RE-INSERTABLE " +
      "through the fold-in loop's guard") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = corpus.count().toInt
    val root = java.nio.file.Files
      .createTempDirectory("graft_forget_loop").toString
    val idxPath = s"$root/idx"
    val vecPath = s"$root/idx.vectors"
    TS.saveGraphIndex(
      graft.similarity.Similarity.bruteTopK(corpus, corpus, 4), idxPath)
    TS.saveVectors(corpus, vecPath)

    // stream-delete 5, 17 then 23; receipts land per batch
    val receipts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Long]
    val q = StreamingAnn.forgetGraphPersisted(
      mem.toDF().toDF("vec_id"), idxPath, entryId = 0L,
      maxGenerations = 2L) { (df, _) => receipts ++= df.collect() }
    try {
      Seq(Seq(5L, 17L), Seq(23L)).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val byId = receipts.map(r => r.getLong(0) ->
      (r.getLong(1), r.getBoolean(3))).toMap
    assert(byId.keySet == Set(5L, 17L, 23L))
    assert(byId.values.forall { case (nOut, wasIdx) =>
      nOut == 4L && wasIdx }, s"receipts: $byId")

    // serve IMMEDIATELY (edges still name the deleted ids): deleted
    // ids can never be returned — the scoring join has no vector
    def serveTop1() = graft.similarity.GraphAnn.searchGraph(
        corpus.filter(col("vec_id") >= 25),
        TS.loadGraphIndexCached(spark, idxPath),
        TS.loadVectorsCached(spark, vecPath),
        entryId = 0L, beam = n + 10, hops = n, k = 1, queryBound = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val lazyServed = serveTop1()
    assert(lazyServed.nonEmpty &&
      lazyServed.values.toSet.intersect(Set(5L, 17L, 23L)).isEmpty,
      s"a tombstoned id surfaced in the lazy-delete serve: $lazyServed")

    // the entry id is protected — deleting it fails the trigger loudly
    val mem2 = MemoryStream[Long]
    val q2 = StreamingAnn.forgetGraphPersisted(
      mem2.toDF().toDF("vec_id"), idxPath, entryId = 0L)()
    try {
      mem2.addData(0L)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("entry")), s"wrong error: $ex")
    } finally q2.stop()

    // consolidate: edges stop naming the deleted ids, and the
    // saturating serve equals brute over the LIVE corpus — the repair
    // restored as-if-never-ingested semantics
    TS.consolidateGraphArtifact(spark, idxPath, vecPath, entryId = 0L,
      beam = n + 10, hops = n, degree = 4)
    val edgeIds = TS.loadGraphIndex(spark, idxPath)
      .select(col("query_id").as("v"))
      .unionByName(TS.loadGraphIndex(spark, idxPath)
        .select(col("neighbor_id").as("v")))
      .collect().map(_.getLong(0)).toSet
    assert(edgeIds.intersect(Set(5L, 17L, 23L)).isEmpty,
      "consolidation left dangling edge rows")
    val live = corpus.filter(!col("vec_id").isin(5L, 17L, 23L))
      .localCheckpoint(true)
    val want = graft.similarity.Similarity.bruteTopK(
        corpus.filter(col("vec_id") >= 25), live, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(serveTop1() == want,
      "post-consolidation serve diverged from brute over the live corpus")

    // a forgotten id is legitimately re-insertable: the fold-in guard
    // reads the tombstone-aware load
    val newVec = corpus.filter(col("vec_id") === 1L)
      .collect().head.getSeq[Float](1)
    val mem3 = MemoryStream[(Long, Seq[Float])]
    val q3 = StreamingAnn.buildGraphPersisted(
      mem3.toDF().toDF("vec_id", "embedding"), corpus.limit(0), idxPath,
      entryId = 0L, beam = n + 10, hops = n, degree = 4)()
    try {
      mem3.addData(5L -> newVec)
      q3.processAllAvailable() // must NOT throw the redelivery guard
    } finally q3.stop()
    assert(TS.loadVectors(spark, vecPath)
      .filter(col("vec_id") === 5L).count() == 1L,
      "re-inserted id missing from the vectors artifact")
  }

  test("forgetHnswPersisted: streamed deletions tombstone the vectors " +
      "artifact, TOP-LAYER nodes are protected (the serve elects its " +
      "entry there), and consolidation repairs the layered base to " +
      "brute-over-live semantics") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val Hnsw = graft.similarity.Hnsw
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("graft_hforget_loop").toString
    val idxPath = s"$root/hnsw"
    val vecPath = s"$root/hnsw.vectors"
    TS.saveHnswIndex(
      Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 1), idxPath)
    TS.saveVectors(corpus, vecPath)
    val layered = TS.loadHnswIndex(spark, idxPath)
    val topSources = layered.filter(col("layer") === 1)
      .select(col("query_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // pick two LOWER-layer-only ids to delete and one top-layer id to
    // prove the guard
    val deletable = (0L until 30L).filterNot(topSources).take(2)
    assert(deletable.size == 2 && topSources.nonEmpty)

    val mem = MemoryStream[Long]
    val q = StreamingAnn.forgetHnswPersisted(
      mem.toDF().toDF("vec_id"), idxPath, maxGenerations = 2L)()
    try {
      mem.addData(deletable: _*); q.processAllAvailable()
    } finally q.stop()
    // deleted ids can't serve: the descent's scoring join has no vector
    val served = Hnsw.searchAuto(
        corpus.filter(col("vec_id") >= 25),
        TS.loadHnswIndexCached(spark, idxPath),
        TS.loadVectorsCached(spark, vecPath),
        beamUpper = 8, hopsUpper = 8, beam = 40, hops = 30, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(served.nonEmpty &&
      served.values.toSet.intersect(deletable.toSet).isEmpty)

    // the top-layer guard rejects loudly
    val mem2 = MemoryStream[Long]
    val q2 = StreamingAnn.forgetHnswPersisted(
      mem2.toDF().toDF("vec_id"), idxPath)()
    try {
      mem2.addData(topSources.head)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("top-layer")), s"wrong error: $ex")
    } finally q2.stop()

    // consolidation: edges stop naming the deleted ids; saturating
    // hierarchical serve == brute over live
    TS.consolidateHnswArtifact(spark, idxPath, vecPath,
      beam = 40, hops = 30, degree = 4)
    val post = TS.loadHnswIndex(spark, idxPath)
    val postIds = post.select(col("query_id").as("v"))
      .unionByName(post.select(col("neighbor_id").as("v")))
      .collect().map(_.getLong(0)).toSet
    assert(postIds.intersect(deletable.toSet).isEmpty,
      "layered consolidation left dangling edge rows")
    val live = corpus.filter(!col("vec_id").isin(deletable: _*))
      .localCheckpoint(true)
    val want = graft.similarity.Similarity.bruteTopK(
        corpus.filter(col("vec_id") >= 25), live, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val got = Hnsw.searchAuto(
        corpus.filter(col("vec_id") >= 25),
        TS.loadHnswIndexCached(spark, idxPath),
        TS.loadVectorsCached(spark, vecPath),
        beamUpper = 30, hopsUpper = 30, beam = 40, hops = 30, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == want,
      "post-consolidation hierarchical serve diverged from brute over live")
  }

  test("serve*FromArtifacts: restart from paths alone — graph and HNSW " +
      "serves match their batch searchers, and a tombstone landed " +
      "MID-STREAM drops from the results at the next trigger (the " +
      "fingerprint-refresh contract, no restart)") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val n = corpus.count().toInt
    val root = java.nio.file.Files
      .createTempDirectory("graft_artifacts_serve").toString

    // flat graph pair
    TS.saveGraphIndex(
      graft.similarity.Similarity.bruteTopK(corpus, corpus, 4),
      s"$root/g")
    TS.saveVectors(corpus, s"$root/g.vectors")
    val qVec = corpus.filter(col("vec_id") === 25L)
      .collect().head.getSeq[Float](1)
    val want1 = graft.similarity.GraphAnn.searchGraph(
        corpus.filter(col("vec_id") === 25L),
        TS.loadGraphIndex(spark, s"$root/g"), corpus,
        entryId = 0L, beam = n + 10, hops = n, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Int, Long)])]
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnn.serveGraphFromArtifacts(
      mem.toDF().toDF("vec_id", "embedding"), spark, s"$root/g",
      entryId = 0L, beam = n + 10, hops = n, k = 3) { (df, bid) =>
      collected += bid -> df.collect()
        .map(r => (r.getInt(1), r.getLong(2))).toSet
    }
    try {
      mem.addData(25L -> qVec); q.processAllAvailable()
      // tombstone the current rank-1 neighbor MID-STREAM
      val victim = want1.find(_._1 == 1).get._2
      import spark.implicits._
      TS.forgetVectorsDelta(Seq(victim).toDF("vec_id"), s"$root/g.vectors")
      mem.addData(25L -> qVec); q.processAllAvailable()
      assert(collected.size == 2)
      assert(collected(0)._2 == want1, "trigger 1 must match batch search")
      val after = collected(1)._2
      assert(!after.map(_._2).contains(victim),
        s"tombstoned id $victim still served after the fingerprint refresh")
      assert(after.nonEmpty)
    } finally q.stop()

    // layered pair: parity with the batch hierarchical search
    TS.saveHnswIndex(
      graft.similarity.Hnsw.buildIndex(corpus, degree = 4, m = 4,
        maxLevel = 1), s"$root/h")
    TS.saveVectors(corpus, s"$root/h.vectors")
    val wantH = graft.similarity.Hnsw.searchAuto(
        corpus.filter(col("vec_id") === 25L),
        TS.loadHnswIndex(spark, s"$root/h"), corpus,
        beamUpper = 8, hopsUpper = 8, beam = n + 10, hops = n, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val gotH = scala.collection.mutable.Set.empty[(Int, Long)]
    val memH = MemoryStream[(Long, Seq[Float])]
    val qH = StreamingAnn.serveHnswFromArtifacts(
      memH.toDF().toDF("vec_id", "embedding"), spark, s"$root/h",
      beamUpper = 8, hopsUpper = 8, beam = n + 10, hops = n, k = 3) {
      (df, _) => gotH ++= df.collect().map(r => (r.getInt(1), r.getLong(2)))
    }
    try {
      memH.addData(25L -> qVec); qH.processAllAvailable()
    } finally qH.stop()
    assert(gotH.toSet == wantH,
      "hierarchical FromArtifacts serve diverged from batch searchAuto")
  }

  test("buildMaxSimPersisted + forgetMaxSimPersisted: the funnel's " +
      "fold-in appends tokens + pooled + means-IVF O(batch) per " +
      "trigger, redelivery rejects loudly, deletion tombstones all " +
      "three artifacts (pooled slot reclaimed at the saturating " +
      "shortlist), a forgotten doc re-ingests through the guard, and " +
      "policy compaction folds every artifact") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val LI = graft.similarity.LateInteraction
    val dims = 64
    // base docs 0..9, 4-token bags
    val tokens = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") % 10).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      .localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("graft_maxsim_loop").toString
    val tokensPath = s"$root/tokens"
    val pooledPath = s"$root/pooled"
    val ivfPath = s"$root/means_ivf"
    val centsPath = s"$root/cents"
    TS.saveTokens(tokens, tokensPath)
    val pooled0 = LI.poolSum(tokens, "doc_id", dims)
    TS.savePooled(pooled0, pooledPath, dims)
    val means0 = LI.meanVectors(pooled0).localCheckpoint(true)
    val cents = means0.filter(col("vec_id").isin(0L, 5L))
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid")).localCheckpoint(true)
    TS.saveCentroids(cents, centsPath)
    TS.saveIvfIndex(
      graft.similarity.Similarity.ivfAssign(means0, cents), ivfPath)

    // fold in docs 200 and 201 with bags DISJOINT from the base corpus
    // (vec_id 40..47 — the base used only vec_id < 40): each is the
    // verbatim twin of one query bag, so it tops that query at the
    // maximal MaxSim score with no tie against a base doc
    def bagOf(lo: Long, as: Long) = emb
      .filter(col("vec_id") >= lo && col("vec_id") < lo + 4)
      .select(lit(as).as("doc_id"), col("vec_id").as("token_idx"),
        col("embedding"))
    val mem = MemoryStream[(Long, Long, Seq[Float])]
    val q = StreamingAnn.buildMaxSimPersisted(
      mem.toDF().toDF("doc_id", "token_idx", "embedding"),
      tokensPath, pooledPath, dims, maxGenerations = 2L,
      ivfPath = ivfPath, centroidsPath = centsPath)()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2))).toSeq
    try {
      mem.addData(rowsOf(bagOf(40L, 200L)): _*); q.processAllAvailable()
      mem.addData(rowsOf(bagOf(44L, 201L)): _*); q.processAllAvailable()
    } finally q.stop()
    // both served through the ANN funnel from artifacts alone: each
    // query's twin tops its ranking at the maximal score
    val qv = bagOf(40L, 1000L).unionByName(bagOf(44L, 1001L))
      .select(col("doc_id").as("query_id"), col("token_idx"),
        col("embedding"))
    def annTop1() = LI.maxSimFunnelAnn(qv,
        TS.loadTokensCached(spark, tokensPath),
        TS.loadIvfIndexCached(spark, ivfPath),
        TS.loadCentroids(spark, centsPath), k = 1, dims = dims,
        shortlist = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(annTop1() == Map(1000L -> 200L, 1001L -> 201L),
      s"folded twins must top their queries: ${annTop1()}")
    // policy compaction fired at maxGenerations = 2 on the artifacts
    // that reached 2 generations (tokens, pooled, ivf)
    Seq(tokensPath, pooledPath, ivfPath).foreach { p =>
      assert(TS.deltaGenerations(spark, p) == 0L,
        s"$p still carries delta generations")
    }

    // redelivery of a live doc rejects loudly
    val mem2 = MemoryStream[(Long, Long, Seq[Float])]
    val q2 = StreamingAnn.buildMaxSimPersisted(
      mem2.toDF().toDF("doc_id", "token_idx", "embedding"),
      tokensPath, pooledPath, dims,
      ivfPath = ivfPath, centroidsPath = centsPath)()
    try {
      mem2.addData(rowsOf(bagOf(40L, 200L)): _*)
      val ex = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("re-delivers")), s"wrong error: $ex")
    } finally q2.stop()

    // stream-delete 200: all three artifacts tombstone; receipts name
    // the pre-delete pooled n_tokens; 999 confirms negatively
    val receipts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem3 = MemoryStream[Long]
    val q3 = StreamingAnn.forgetMaxSimPersisted(
      mem3.toDF().toDF("doc_id"), tokensPath, pooledPath,
      ivfPath = ivfPath) { (df, _) => receipts ++= df.collect() }
    try {
      mem3.addData(200L, 999L); q3.processAllAvailable()
    } finally q3.stop()
    val byId = receipts.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(byId == Map(200L -> true, 999L -> false), s"receipts: $byId")
    assert(receipts.find(_.getLong(0) == 200L).get.getLong(1) == 4L,
      "the receipt must carry the pre-delete bag size")
    // the deleted twin leaves the serve; its untouched peer stays
    val post = annTop1()
    assert(post(1001L) == 201L && post(1000L) != 200L,
      s"post-forget serve: $post")
    // the pooled tombstone reclaims the coarse slot at the SATURATING
    // brute shortlist = 1: a leaked pooled row for 200 would win query
    // 1000's only coarse slot (cosine 1 mean), the rerank would drop
    // it against the tombstoned tokens, and the query would emit NO
    // row — so a present, non-200 answer pins both tombstones
    val brute = LI.maxSimFunnelWith(qv,
        TS.loadTokensCached(spark, tokensPath),
        TS.loadPooledCached(spark, pooledPath), k = 1, dims = dims,
        shortlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(brute.contains(1000L) && brute(1000L) != 200L &&
      brute(1001L) == 201L,
      s"brute funnel after pooled tombstone: $brute")

    // the forgotten doc is legitimately re-ingestable
    val mem4 = MemoryStream[(Long, Long, Seq[Float])]
    val q4 = StreamingAnn.buildMaxSimPersisted(
      mem4.toDF().toDF("doc_id", "token_idx", "embedding"),
      tokensPath, pooledPath, dims,
      ivfPath = ivfPath, centroidsPath = centsPath)()
    try {
      mem4.addData(rowsOf(bagOf(40L, 200L)): _*); q4.processAllAvailable()
    } finally q4.stop()
    assert(annTop1() == Map(1000L -> 200L, 1001L -> 201L),
      "re-ingested twin must serve again")
  }

  test("forgetIvfPersisted: streamed deletions tombstone the CELL INDEX " +
      "itself (the flat probe scores index embeddings — a vectors " +
      "tombstone alone cannot stop it), plus the IVF-PQ codes and the " +
      "vectors artifact; receipts carry the pre-delete cell; the policy " +
      "compaction folds every artifact physically") {
    implicit val sqlCtx = spark.sqlContext
    val TS = graft.similarity.TrainedState
    val corpus = emb.filter(col("vec_id") < 30).localCheckpoint(true)
    val cents = corpus.filter(col("vec_id") % 15 === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid")).localCheckpoint(true)
    val books = graft.similarity.ProductQuantizer.codebooks(
      corpus, 64, 4, 10)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_forget_loop").toString
    val idxPath = s"$root/ivf"
    val pqPath = s"$root/ivfpq"
    val vecPath = s"$root/vectors"
    TS.saveIvfIndex(
      graft.similarity.Similarity.ivfAssign(corpus, cents), idxPath)
    TS.saveIvfPqIndex(
      graft.similarity.IvfPq.encode(corpus, cents, books, 64, 4), pqPath)
    TS.saveVectors(corpus, vecPath)

    // stream-delete 5, 17 then 23 and a never-indexed 99; receipts land
    // per batch; maxGenerations = 2 so the second trigger compacts
    val receipts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Long]
    val q = StreamingAnn.forgetIvfPersisted(
      mem.toDF().toDF("vec_id"), idxPath, maxGenerations = 2L,
      pqIndexPath = pqPath, vectorsPath = vecPath) { (df, _) =>
      receipts ++= df.collect()
    }
    try {
      Seq(Seq(5L, 17L), Seq(23L, 99L)).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val byId = receipts.map(r =>
      r.getLong(0) -> r.getBoolean(2)).toMap
    assert(byId == Map(5L -> true, 17L -> true, 23L -> true, 99L -> false),
      s"receipts: $byId")
    // receipts name the PRE-delete cell for indexed ids
    assert(receipts.filter(_.getLong(0) != 99L)
      .forall(r => Set(0L, 15L).contains(r.getLong(1))),
      "an indexed id's receipt must carry its cell")

    val gone = Set(5L, 17L, 23L)
    // the flat probe (index embeddings only, saturating nprobe) must
    // equal brute over the live corpus — a leaked tombstone surfaces as
    // a wrong neighbor
    val live = corpus.filter(!col("vec_id").isin(gone.toSeq: _*))
      .localCheckpoint(true)
    val queries = corpus.filter(col("vec_id") < 4)
    val served = graft.similarity.Similarity.ivfTopKFromIndex(
        queries, TS.loadIvfIndexCached(spark, idxPath), k = 2, cents,
        nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = graft.similarity.Similarity.bruteTopK(queries, live, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == want,
      "flat probe over the forgotten index diverged from brute over live")
    // the IVF-PQ pair drops them too (codes shortlist + vectors rerank)
    val servedPq = graft.similarity.IvfPq.topKFromIndex(
        queries, TS.loadIvfPqIndexCached(spark, pqPath),
        TS.loadVectorsCached(spark, vecPath), k = 2, cents, books,
        dim = 64, numSub = 4, nprobe = 2, rerank = 40)
      .collect().map(_.getLong(2)).toSet
    assert(servedPq.intersect(gone).isEmpty,
      s"a tombstoned id served from the PQ pair: $servedPq")

    // policy compaction ran (2 generations reached maxGenerations = 2):
    // every artifact folded physically, tombstones out of the bytes
    Seq(idxPath, pqPath, vecPath).foreach { p =>
      assert(TS.deltaGenerations(spark, p) == 0L,
        s"$p still carries delta generations")
    }
    assert(spark.read.parquet(idxPath)
      .filter(col("embedding").isNull).count() == 0)
    assert(spark.read.parquet(pqPath)
      .filter(col("codes").isNull).count() == 0)
    assert(spark.read.parquet(vecPath)
      .filter(col("embedding").isNull).count() == 0)
    assert(spark.read.parquet(idxPath)
      .filter(col("vec_id").isin(gone.toSeq: _*)).count() == 0,
      "compacted cell index still names a deleted id")
  }
}
