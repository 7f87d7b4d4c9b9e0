package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 14): the 100× LEG — the
  * r12/r13 verdicts' open item: every ~flat claim (hierarchical
  * search, insert, delta write, reconciled load) had been measured
  * across ONE decade (sf0.1 → 10×), where fixed overheads can hide a
  * super-linear term; this measures the same legs TWO decades up.
  * Embeddings-only corpus at `mult`× via the Round18ScaleMeasure
  * recipe (dense re-ids `vec_id·mult + c`, 0.001·c perturbation on
  * component 0 — distribution- and id-density-preserving), layered
  * build via the corpus-scale adjacency builder, plus the
  * DELTA-RECONCILED LOAD leg (load an artifact carrying a fresh
  * generation, then search it — the serving fleet's restart path).
  *
  * Run: sbt "Test/runMain graft.Round24ScaleMeasure [mult] [sfDir] [outDir]"
  */
object Round24ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse(s"/tmp/graft_sf$mult")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- materialize the mult× embeddings corpus (idempotent; the
    // Round18ScaleMeasure embeddings recipe verbatim) ----
    if (!new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      Tables.load(spark, sfDir, "embeddings")
        .select(explode(sequence(lit(0), lit(mult - 1))).as("c"), col("*"))
        .withColumn("vec_id", col("vec_id") * mult + col("c"))
        .withColumn("embedding", transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("c").cast("float") * lit(0.001f))
            .otherwise(x)))
        .drop("c")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[r24scale] materialized ${mult}x embeddings at $outDir")
    }

    // per-layer corpus-scale edge builder (the Round21 dial: ~|layer|/50
    // stride centroids, constant cell size as the corpus grows)
    val edgeBuilder = (nodes: DataFrame, d: Int) => {
      val cents = nodes.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val assigned = graft.similarity.Similarity.ivfAssign(nodes, cents)
      graft.similarity.Similarity.knnGraphAdjacent(assigned, cents,
        k = d, nprobe = 3)
    }

    def measure(tag: String, dir: String)
        : (Double, Double, Double, Double, Double, Double) = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val idxPath = s"/tmp/graft_r24_hnsw_$tag"
      // ---- layered build + persist (corpus-scaled work) ----
      val t0 = System.nanoTime()
      graft.similarity.TrainedState.saveHnswIndex(
        graft.similarity.Hnsw.buildIndex(emb, degree = 6, m = 8,
          maxLevel = 2, edgeBuilder = Some(edgeBuilder)), idxPath)
      val buildS = (System.nanoTime() - t0) / 1e9
      val layered = graft.similarity.TrainedState
        .loadHnswIndex(spark, idxPath)
      val (entryId, entryLevel) = {
        val top = layered.orderBy(col("layer").desc, col("query_id").asc)
          .select(col("query_id"), col("layer")).limit(1).collect()
        (top(0).getLong(0), top(0).getInt(1))
      }
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      def hierOnce(l: DataFrame): Unit = graft.similarity.Hnsw.search(
          probes, l, emb, entryId, entryLevel, beamUpper = 1,
          hopsUpper = 2, beam = 8, hops = 6, k = 5)
        .write.format("noop").mode("overwrite").save()
      hierOnce(layered) // warm JIT + parquet footers
      val t1 = System.nanoTime()
      hierOnce(layered)
      val hierS = (System.nanoTime() - t1) / 1e9
      // ---- incremental insert (claim: ~corpus-independent) ----
      val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
      val batch = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
          col("embedding")).localCheckpoint(true)
      def insertOnce(): Unit = graft.similarity.Hnsw.insert(
          layered, batch, emb, m = 8, maxLevel = 2,
          beam = 8, hops = 6, degree = 6)
        .write.format("noop").mode("overwrite").save()
      insertOnce()
      val t3 = System.nanoTime()
      insertOnce()
      val insS = (System.nanoTime() - t3) / 1e9
      // ---- DELTA fold-in write (claim: batch-scaled) ----
      val (_, delta) = graft.similarity.Hnsw.insertWithDelta(
        layered, batch, emb, m = 8, maxLevel = 2, beam = 8, hops = 6,
        degree = 6)
      val deltaC = delta.localCheckpoint(true) // isolate the WRITE cost
      val t4 = System.nanoTime()
      graft.similarity.TrainedState.appendHnswDelta(deltaC, idxPath)
      val deltaS = (System.nanoTime() - t4) / 1e9
      // ---- DELTA-RECONCILED LOAD + serve (claim: ~flat — the
      // localized reconcile collects the batch-bounded slice once,
      // the base scan is unchanged; the serving fleet's restart path
      // over an artifact carrying a live generation) ----
      val t5 = System.nanoTime()
      val reconciled = graft.similarity.TrainedState
        .loadHnswIndex(spark, idxPath)
      hierOnce(reconciled)
      val loadS = (System.nanoTime() - t5) / 1e9
      println(f"[r24scale] $tag build=$buildS%.2fs hier_search=$hierS%.2fs " +
        f"insert50=$insS%.2fs delta_write=$deltaS%.2fs " +
        f"reconciled_load_serve=$loadS%.2fs")
      (buildS, hierS, insS, deltaS, loadS, 0.0)
    }

    val (b1, h1, i1, d1, l1, _) = measure("sf01", sfDir)
    val (bN, hN, iN, dN, lN, _) = measure(s"sf_${mult}x", outDir)
    println(f"[r24scale] ${mult}x ratios: build=${bN / b1}%.2f " +
      f"(corpus-scaled), hier_search=${hN / h1}%.2f (claim ~flat), " +
      f"insert=${iN / i1}%.2f (claim ~flat), " +
      f"delta_write=${dN / d1}%.2f (claim batch-bounded ~flat), " +
      f"reconciled_load_serve=${lN / l1}%.2f (claim ~flat)")
    spark.stop()
  }
}
