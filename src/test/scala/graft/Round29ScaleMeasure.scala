package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 15, third session): the
  * BM25 retrieval deployment at 100× — the three per-trigger costs
  * that must NOT scale with the corpus, against an index that does.
  *
  * Corpus construction isolates the serving claim: the big corpus is
  * 100 vocabulary-SALTED replicas of the sf0.1 documents (every token
  * suffixed with its replica tag), so the postings table grows 100×
  * while each query term's df — hence its MATCHED postings — stays
  * constant. A serve that reads only its terms' row groups (the
  * term-sorted layout + the localized `isin`) is then flat; the old
  * unpruned plan (postings.join(broadcast(qt)) over the whole scan)
  * pays the full 100×.
  *
  *   1. serve_trigger — `Retrieval.topK` through the cached loads,
  *      replica-0 query terms. Claim: ~flat.
  *   2. fold_trigger — `buildRetrievalPersisted` one 50-doc batch
  *      (fresh vocabulary). Claim: ~flat (O(batch + touched terms)).
  *   3. forget_trigger — `forgetRetrievalPersisted` 50 live ids.
  *      Claim: ~flat (one tombstone generation, lazy receipts).
  *
  * Run: sbt "Test/runMain graft.Round29ScaleMeasure [mult] [sfDir]"
  */
object Round29ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val TS = graft.similarity.TrainedState

    def timedMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val baseDocs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nBase = baseDocs.count()

    /** `replicas` vocabulary-salted copies: replica r's tokens carry a
      * `qr<r>` suffix, ids shift by r·nBase — per-term df constant. */
    def corpus(replicas: Int): DataFrame =
      (0 until replicas).map { r =>
        baseDocs.select((col("doc_id") + lit(r.toLong * nBase))
            .as("doc_id"),
          concat_ws(" ", transform(graft.text.TextOps.tokens(col("text")),
            t => concat(t, lit(s"qr$r")))).as("text"))
      }.reduce(_ unionByName _)

    def measure(tag: String, replicas: Int)
        : (Double, Double, Double, Double) = {
      val docs = corpus(replicas).localCheckpoint(true)
      val root = s"/tmp/graft_r29_$tag/idx"
      val (p0, t0, l0, s0) =
        graft.text.Retrieval.buildIndex(docs, "doc_id", "text")
      // files ∝ rows — the saveGraphIndex density discipline
      val postFiles = math.max(32, replicas * 8)
      TS.saveRetrievalIndex(p0, t0, l0, s0, root,
        postingsFiles = postFiles, termsFiles = math.max(4, replicas),
        docLensFiles = math.max(4, replicas))

      // 1. serve: replica-0 terms (df constant across scales)
      val qs = Seq(
        (1L, Seq("streamqr0", "filterqr0", "mergeqr0")),
        (2L, Seq("tableqr0", "scanqr0")),
        (3L, Seq("vectorqr0", "sparkqr0", "batchqr0")))
        .toDF("query_id", "terms").localCheckpoint(true)
      def serve(): Unit = {
        val (p, t, d, s) = TS.loadRetrievalIndexCached(spark, root)
        noop(graft.text.Retrieval.topK(qs, p, t, d, s, 10))
      }
      serve(); val tServe = timedMin(serve())
      // the COUNTERFACTUAL: the pre-round plan (no localized isin —
      // the broadcast join streams the whole postings scan), same
      // arithmetic, to attribute the pruning term
      def serveUnpruned(): Unit = {
        val (p, t, d, s) = TS.loadRetrievalIndexCached(spark, root)
        val qt = qs.select(col("query_id"),
            explode(col("terms")).as("term")).distinct()
          .join(t, Seq("term"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("bm25_e9").desc, col("doc_id"))
        noop(p.join(broadcast(qt), Seq("term"))
          .join(d, Seq("doc_id")).crossJoin(broadcast(s))
          .withColumn("term_e9", round(
            log(lit(1.0) + (col("n") - col("df") + 0.5) /
              (col("df") + 0.5)) * col("tf") * 2.2 /
              (col("tf") + lit(1.2) *
                (lit(0.25) + col("dl") * 0.75 / col("avgdl"))) * 1e9)
            .cast("long"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("term_e9")).as("bm25_e9"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10))
      }
      serveUnpruned(); val tServeUn = timedMin(serveUnpruned())

      // 2. fold trigger: 50 fresh-vocabulary docs per batch
      implicit val sqlCtx = spark.sqlContext
      def foldBatch(i: Int): Seq[(Long, String)] =
        (0 until 50).map { j =>
          (900000000L + i * 50L + j,
            s"zzalpha$i beta$j gamma${i}x$j delta zz$i epsilon$j")
        }
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingRetrieval.buildRetrievalPersisted(
        mem.toDF().toDF("doc_id", "text"), root,
        maxGenerations = 1000L)()
      val tFold = try {
        mem.addData(foldBatch(0): _*); q.processAllAvailable() // warm
        (1 to 3).map { i =>
          mem.addData(foldBatch(i): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally q.stop()

      // 3. forget trigger: 50 live base ids per batch
      val mem2 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val q2 = graft.streaming.StreamingRetrieval.forgetRetrievalPersisted(
        mem2.toDF().toDF("doc_id"), root, maxGenerations = 1000L)()
      val tForget = try {
        mem2.addData(0L to 49L: _*); q2.processAllAvailable() // warm
        (1 to 3).map { i =>
          val lo = 50L * i
          mem2.addData(lo until (lo + 50L): _*)
          val t0 = System.nanoTime()
          q2.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally q2.stop()

      println(f"[r29scale] $tag docs=${nBase * replicas} " +
        f"serve=$tServe%.2fs serve_unpruned=$tServeUn%.2fs " +
        f"fold_trigger=$tFold%.2fs forget_trigger=$tForget%.2fs")
      (tServe, tServeUn, tFold, tForget)
    }

    val (s1, u1, f1, g1) = measure("sf01", 1)
    val (sN, uN, fN, gN) = measure(s"sf_${mult}x", mult)
    println(f"[r29scale] ${mult}x ratios: serve=${sN / s1}%.2f " +
      f"serve_unpruned=${uN / u1}%.2f fold_trigger=${fN / f1}%.2f " +
      f"forget_trigger=${gN / g1}%.2f " +
      f"(claims ~flat for the pruned serve/fold/forget — the unpruned " +
      f"counterfactual carries the corpus term)")
    spark.stop()
  }
}
