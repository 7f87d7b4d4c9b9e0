package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round-10 continuation): GRAPH ANN
  * at corpus scale. The gate queries bound their slices by design, so
  * this measures the real claim directly — with a PREBUILT persisted
  * graph index, search latency is corpus-INDEPENDENT (per-hop work is
  * frontier × out-degree; the hop's isin probe prunes the sorted edge
  * files), while index build scales with the corpus.
  *
  * Uses the Round18ScaleMeasure 10× embeddings corpus (dense re-ids +
  * component-0 perturbation — distribution-preserving). Build =
  * [[graft.similarity.Similarity.knnGraphAdjacent]] (the corpus-scale
  * builder: cell-adjacency probing, no per-vector centroid walk) over
  * stride centroids; search = [[graft.similarity.GraphAnn.searchGraph]]
  * on 20 probes through [[graft.similarity.TrainedState]] artifacts.
  *
  * Run: sbt "Test/runMain graft.Round19ScaleMeasure [mult] [sfDir] [outDir]"
  */
object Round19ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // R19_PARTS: the save-time file-count knob (saveGraphIndex
      // emits one file per range partition). At a fixed 32 the 100×
      // corpus packs 100× more rows per file, so the per-hop isin
      // row-group pruning degrades — files must scale with the corpus
      // for the pruning contract to hold (the saveIvfIndex "the knob,
      // not the layout, changes" note, measured in SCALE.md r14).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("R19_PARTS", "32"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(new java.io.File(s"$outDir/embeddings.parquet").exists(),
      s"run Round18ScaleMeasure first to materialize $outDir")

    def measure(tag: String, dir: String): (Double, Double) = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val idxPath = s"/tmp/graft_r19_graph_$tag"
      // ---- build + persist (corpus-scaled work) ----
      val t0 = System.nanoTime()
      val assigned = graft.similarity.Similarity.ivfAssign(emb, cents)
      graft.similarity.TrainedState.saveGraphIndex(
        graft.similarity.Similarity.knnGraphAdjacent(
          assigned, cents, k = 6, nprobe = 3), idxPath)
      val buildS = (System.nanoTime() - t0) / 1e9
      // ---- search from the persisted artifact (should be ~flat) ----
      val edges = graft.similarity.TrainedState.loadGraphIndex(spark, idxPath)
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      def searchOnce(): Unit = graft.similarity.GraphAnn.searchGraph(
          probes, edges, emb, entryId = 0L, beam = 8, hops = 6, k = 5)
        .write.format("noop").mode("overwrite").save()
      searchOnce() // warm JIT + parquet footers
      val t1 = System.nanoTime()
      searchOnce()
      val searchS = (System.nanoTime() - t1) / 1e9
      println(f"[r19scale] $tag build=$buildS%.2fs search=$searchS%.2fs")
      (buildS, searchS)
    }

    val (b1, s1) = measure("sf01", sfDir)
    val (b10, s10) = measure(s"sf1_${mult}x", outDir)
    println(f"[r19scale] build ratio=${b10 / b1}%.2f (corpus-scaled), " +
      f"search ratio=${s10 / s1}%.2f (expected ~flat)")
    spark.stop()
  }
}
