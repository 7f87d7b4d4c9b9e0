package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 11): the HNSW HIERARCHY at
  * corpus scale. Round19ScaleMeasure established that flat graph
  * search from a persisted index is corpus-independent per hop; the
  * hierarchy's claim is additive — the greedy descent costs a small,
  * corpus-independent constant (|queries| × degree per upper layer,
  * upper layers geometrically small), buying a refined per-query
  * layer-0 entry. So measured hierarchical search should stay ~flat at
  * 10× corpus AND sit within a small constant of the flat single-entry
  * search on the same layer-0 graph.
  *
  * Layers are built with the corpus-scale adjacency builder
  * ([[graft.similarity.Similarity.knnGraphAdjacent]] over per-layer
  * stride centroids — no all-pairs work at any layer), persisted via
  * [[graft.similarity.TrainedState.saveHnswIndex]], and searched from
  * the loaded artifact ([[graft.similarity.Hnsw.search]]).
  *
  * Uses the Round18ScaleMeasure 10× embeddings corpus (dense re-ids +
  * component-0 perturbation — distribution-preserving; run Round18
  * first to materialize it).
  *
  * Run: sbt "Test/runMain graft.Round21ScaleMeasure [mult] [sfDir] [outDir]"
  */
object Round21ScaleMeasure {

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(new java.io.File(s"$outDir/embeddings.parquet").exists(),
      s"run Round18ScaleMeasure first to materialize $outDir")

    // per-layer corpus-scale edge builder: stride centroids WITHIN the
    // layer's node set (hash membership is independent of the id
    // stride, so every layer keeps ~|layer|/50 centroids — cell size
    // stays constant as the corpus grows, the knnGraphAdjacent dial)
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
      val idxPath = s"/tmp/graft_r21_hnsw_$tag"
      // ---- layered build + persist (corpus-scaled work) ----
      val t0 = System.nanoTime()
      graft.similarity.TrainedState.saveHnswIndex(
        graft.similarity.Hnsw.buildIndex(emb, degree = 6, m = 8,
          maxLevel = 2, edgeBuilder = Some(edgeBuilder)), idxPath)
      val buildS = (System.nanoTime() - t0) / 1e9
      // ---- hierarchical search from the persisted artifact ----
      val layered = graft.similarity.TrainedState
        .loadHnswIndex(spark, idxPath)
      val (entryId, entryLevel) = {
        val top = layered.orderBy(col("layer").desc, col("query_id").asc)
          .select(col("query_id"), col("layer")).limit(1).collect()
        (top(0).getLong(0), top(0).getInt(1))
      }
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      def hierOnce(): Unit = graft.similarity.Hnsw.search(
          probes, layered, emb, entryId, entryLevel, beamUpper = 1,
          hopsUpper = 2, beam = 8, hops = 6, k = 5)
        .write.format("noop").mode("overwrite").save()
      // flat reference: the SAME layer-0 graph from the single global
      // entry — isolates the descent's constant
      val e0 = layered.filter(col("layer") === 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos_sim"))
      def flatOnce(): Unit = graft.similarity.GraphAnn.searchGraph(
          probes, e0, emb, entryId, beam = 8, hops = 6, k = 5)
        .write.format("noop").mode("overwrite").save()
      hierOnce(); flatOnce() // warm JIT + parquet footers
      val t1 = System.nanoTime()
      hierOnce()
      val hierS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      flatOnce()
      val flatS = (System.nanoTime() - t2) / 1e9
      // ---- incremental insert (claim: ~corpus-independent — one
      // bounded-batch search per layer + the touched-slice re-prune;
      // batch = 50 existing embeddings re-id'd past the corpus) ----
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
      // ---- DELTA fold-in write (claim: write cost scales with the
      // BATCH — the changed slice appends under the saved index and
      // the untouched base files never rewrite; contrast with the
      // full copy-on-write materialization insertOnce times) ----
      val (_, delta) = graft.similarity.Hnsw.insertWithDelta(
        layered, batch, emb, m = 8, maxLevel = 2, beam = 8, hops = 6,
        degree = 6)
      val deltaC = delta.localCheckpoint(true) // isolate the WRITE cost
      graft.similarity.TrainedState.appendHnswDelta(deltaC, idxPath)
      val t4 = System.nanoTime()
      graft.similarity.TrainedState.appendHnswDelta(deltaC, idxPath)
      val deltaS = (System.nanoTime() - t4) / 1e9
      // ---- diversified (Alg 4) edge build via the SHIPPED bucketed
      // candidate source — the path diversifiedEdges auto-dispatches
      // to above 2^15 nodes, forced here at BOTH scales so the ratio
      // compares like with like (claim: construction stays
      // ~corpus-scaled — candidates come from ~√n hash-sampled IVF
      // cells, pairwise diversity sims are |nodes| × C² with C =
      // degree × candFactor — where the default bruteTopK source is
      // quadratic and only viable per-layer on the geometrically
      // small upper layers) ----
      def divOnce(): Unit = graft.similarity.Hnsw.diversifiedEdges(
          emb, degree = 6, candFactor = 2, fill = true,
          minNodesForBucketed = 1)
        .write.format("noop").mode("overwrite").save()
      divOnce()
      val t5 = System.nanoTime()
      divOnce()
      val divS = (System.nanoTime() - t5) / 1e9
      println(f"[r21scale] $tag build=$buildS%.2fs hier_search=$hierS%.2fs " +
        f"flat_search=$flatS%.2fs insert50=$insS%.2fs " +
        f"delta_write=$deltaS%.2fs div_build=$divS%.2fs")
      (buildS, hierS, flatS, insS, deltaS, divS)
    }

    val (b1, h1, f1, i1, d1, v1) = measure("sf01", sfDir)
    val (b10, h10, f10, i10, d10, v10) = measure(s"sf1_${mult}x", outDir)
    println(f"[r21scale] build ratio=${b10 / b1}%.2f (corpus-scaled), " +
      f"hier search ratio=${h10 / h1}%.2f (expected ~flat), " +
      f"insert ratio=${i10 / i1}%.2f (expected ~flat), " +
      f"delta write ratio=${d10 / d1}%.2f (expected ~flat — " +
      "batch-bounded), " +
      f"diversified build ratio=${v10 / v1}%.2f (expected ~corpus-" +
      "scaled, NOT quadratic), " +
      f"descent overhead sf01=${h1 / f1}%.2fx 10x=${h10 / f10}%.2fx")
    spark.stop()
  }
}
