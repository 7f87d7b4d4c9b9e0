package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 15, addendum 3): the MaxSim
  * late-interaction SERVING family at 100× — the last query family
  * with no two-decade legs. Token corpus: docs ∝ corpus with a
  * constant 10-token bag per doc (the dimension that grows at 100 TB
  * is the DOC count), queries a fixed 20×2-token batch at both scales.
  *
  *   1. brute funnel (persisted pooled + tokens artifacts —
  *      `maxSimFunnelWith`): the coarse stage scores EVERY pooled doc
  *      per batch. Claim: corpus-scaled — honest, documented.
  *   2. ANN funnel (persisted IVF over mean vectors + tokens —
  *      `maxSimFunnelAnn`, corpus-scaled ~50-doc cells, nprobe 3):
  *      coarse cost ∝ probed cells. Claim: ~flat.
  *
  * Run the Round25 ivf leg first (or anything that materializes
  * /tmp/graft_sf100). Serve legs are min-of-3 (the Round25 honesty
  * rule: single-rep serve numbers on this host are untrustworthy).
  *
  * Run: sbt "Test/runMain graft.Round26ScaleMeasure [mult] [sfDir]"
  */
object Round26ScaleMeasure {

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
    val TS = graft.similarity.TrainedState
    val LI = graft.similarity.LateInteraction
    def timedMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def measure(tag: String, dir: String): (Double, Double) = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val nDocs = math.max(1L, emb.count() / 10L) // 10 tokens per doc
      val dv = emb.select((col("vec_id") % nDocs).as("doc_id"),
        col("vec_id").as("token_idx"), col("embedding"))
      // fixed 20-query 2-token batch; ids offset past every doc id
      val qv = emb.filter(col("vec_id") < 40)
        .select((lit(1000000000L) + col("vec_id") % 20).as("query_id"),
          col("vec_id").as("token_idx"), col("embedding"))
        .localCheckpoint(true)
      val root = s"/tmp/graft_r26_$tag"
      TS.saveTokens(dv, s"$root/tokens")
      val tokens = TS.loadTokensCached(spark, s"$root/tokens")
      TS.savePooled(LI.poolSum(tokens, "doc_id", dims = 64),
        s"$root/pooled", dims = 64)
      // brute funnel: persisted pooled + tokens, coarse scores all docs
      def brute(): Unit = noop(LI.maxSimFunnelWith(qv, tokens,
        TS.loadPooledCached(spark, s"$root/pooled"), k = 3, dims = 64,
        shortlist = 10))
      brute(); val tBrute = timedMin(brute())
      // ANN funnel: corpus-scaled ~50-doc cells over mean vectors
      val means = LI.meanVectors(
        LI.poolSum(tokens, "doc_id", dims = 64)).localCheckpoint(true)
      val cents = means.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      TS.saveIvfIndex(
        graft.similarity.Similarity.ivfAssign(means, cents), s"$root/ivf")
      val index = TS.loadIvfIndexCached(spark, s"$root/ivf")
      def ann(): Unit = noop(LI.maxSimFunnelAnn(qv, tokens, index, cents,
        k = 3, dims = 64, shortlist = 10, nprobe = 3))
      ann(); val tAnn = timedMin(ann())
      println(f"[r26scale] $tag docs=$nDocs brute_funnel=$tBrute%.2fs " +
        f"ann_funnel=$tAnn%.2fs")
      (tBrute, tAnn)
    }

    val (b1, a1) = measure("sf01", sfDir)
    val (bN, aN) = measure(s"sf_${mult}x", bigDir)
    println(f"[r26scale] ${mult}x ratios: brute_funnel=${bN / b1}%.2f " +
      f"(claim corpus-scaled — the documented brute-coarse trade), " +
      f"ann_funnel=${aN / a1}%.2f (claim ~flat — probed-cell coarse + " +
      f"id-pruned rerank)")
    spark.stop()
  }
}
