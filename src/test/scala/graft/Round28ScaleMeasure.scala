package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 15, third session): the
  * funnel's PERSISTED FOLD-IN and DOC-DELETION triggers at 100× —
  * `buildMaxSimPersisted` / `forgetMaxSimPersisted` per-batch cost
  * must be O(batch) against any corpus size. The fold-in trigger's
  * corpus-facing work is the id-pruned redelivery probe (row-group
  * pruned against the doc_id-sorted tokens artifact), a ONE-ROW dims
  * read on the pooled artifact (pooledDimsQuick — the full
  * loadPooledParams min/max sweep would be the O(corpus) term), and a
  * |batch|·C means-assignment against the broadcast centroid table;
  * everything else appends batch-sized delta generations. The forget
  * trigger tombstones three artifacts O(batch) with LAZY receipts
  * (the no-op sink pays nothing). Token corpus: docs ∝ corpus at a
  * constant 10-token bag (the Round26 construction); fold batches are
  * a fixed 5 docs × 10 tokens, forget batches a fixed 50 doc ids;
  * compaction policy is held out of the timed legs (maxGenerations
  * high) — it is measured separately as data-sized maintenance.
  *
  * Run Round25 (or anything materializing /tmp/graft_sf100) first.
  *
  * Run: sbt "Test/runMain graft.Round28ScaleMeasure [mult] [sfDir]"
  */
object Round28ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(2).getOrElse(s"/tmp/graft_sf$mult")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val TS = graft.similarity.TrainedState
    val LI = graft.similarity.LateInteraction

    def measure(tag: String, dir: String): (Double, Double) = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val nDocs = math.max(1L, emb.count() / 10L) // 10 tokens per doc
      val dv = emb.select((col("vec_id") % nDocs).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      val root = s"/tmp/graft_r28_$tag"
      TS.saveTokens(dv, s"$root/tokens")
      val pooled0 = LI.poolSum(
        TS.loadTokens(spark, s"$root/tokens"), "doc_id", 64)
      TS.savePooled(pooled0, s"$root/pooled", dims = 64)
      val means = LI.meanVectors(pooled0).localCheckpoint(true)
      // corpus-scaled ~50-doc cells — the production shape
      val cents = means.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      TS.saveCentroids(cents, s"$root/cents")
      TS.saveIvfIndex(
        graft.similarity.Similarity.ivfAssign(means, cents), s"$root/ivf")

      // a fixed pool of fold-able bags: 5 docs x 10 tokens per batch,
      // doc ids far past every corpus id
      val bagTokens = emb.filter(col("vec_id") < 400)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      def foldBatch(i: Int): Seq[(Long, Long, Seq[Float])] =
        (0 until 50).map { j =>
          val (tid, e) = bagTokens((i * 50 + j) % bagTokens.length)
          (2000000000L + i * 5L + j / 10, tid, e)
        }

      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Seq[Float])]
      val q = graft.streaming.StreamingAnn.buildMaxSimPersisted(
        mem.toDF().toDF("doc_id", "token_idx", "embedding"),
        s"$root/tokens", s"$root/pooled", dims = 64,
        maxGenerations = 1000L, // compaction held out of the timed legs
        ivfPath = s"$root/ivf", centroidsPath = s"$root/cents")()
      val tFold = try {
        mem.addData(foldBatch(0): _*); q.processAllAvailable() // warm
        (1 to 3).map { i =>
          mem.addData(foldBatch(i): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally q.stop()

      val mem2 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val q2 = graft.streaming.StreamingAnn.forgetMaxSimPersisted(
        mem2.toDF().toDF("doc_id"), s"$root/tokens", s"$root/pooled",
        maxGenerations = 1000L, ivfPath = s"$root/ivf")()
      val tForget = try {
        // LIVE doc ids at BOTH scales (nDocs >= 200 everywhere) — a
        // non-existent id would skip the doomed-token enumeration and
        // under-measure the small leg
        mem2.addData(0L to 49L: _*); q2.processAllAvailable() // warm
        (1 to 3).map { i =>
          val lo = 50L * i
          mem2.addData(lo until (lo + 50L): _*)
          val t0 = System.nanoTime()
          q2.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally q2.stop()

      println(f"[r28scale] $tag docs=$nDocs fold_trigger=$tFold%.2fs " +
        f"(5-doc bags) forget_trigger=$tForget%.2fs (50-id batches)")
      (tFold, tForget)
    }

    val (f1, g1) = measure("sf01", sfDir)
    val (fN, gN) = measure(s"sf_${mult}x", bigDir)
    println(f"[r28scale] ${mult}x ratios: fold_trigger=${fN / f1}%.2f " +
      f"forget_trigger=${gN / g1}%.2f (claim ~flat — O(batch) delta " +
      f"appends, id-pruned redelivery probe, one-row pooled dims read, " +
      f"lazy receipts)")
    spark.stop()
  }
}
