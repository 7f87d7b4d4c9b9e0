package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for SCALE.md (round 15): the LAST unmeasured
  * serving family at 100× plus the two seams the r14 verdict flagged —
  * exactly where the measured file-density term could re-enter:
  *
  *   1. IVF / IVF-PQ serving at 100× with corpus-scaled centroids
  *      (stride — cell SIZE stays constant as the corpus grows, the
  *      production deployment shape): `ivfTopKFromIndex` /
  *      `IvfPq.topKFromIndex` probe cost should be ~flat.
  *   2. Fixed-K cells at 100× (cells 100× denser): the salted
  *      cell-split save ([[graft.similarity.TrainedState.saveIvfIndex]]
  *      `targetRowsPerFile`) vs the one-file-per-cell layout — the
  *      hot-cell parallelism knob, measured.
  *   3. POST-COMPACTION flat-graph search at 100×: compaction now
  *      re-saves DATA-SIZED, so the search that was flat before a
  *      compaction must stay flat after one (the r14 term entered at
  *      exactly this path when compaction re-saved at the session's
  *      fixed shuffle default).
  *   4. The persisted fold-in loop's PER-TRIGGER cost (load → insert →
  *      append edge delta → append vectors delta) at sf0.1 vs 100×
  *      corpus: with the corpus side an artifact (no per-trigger
  *      full-corpus checkpoint), trigger cost should be batch-scaled,
  *      ~independent of corpus size.
  *
  * Embeddings corpus at `mult`× via the Round18/24 recipe (dense
  * re-ids, component-0 perturbation). Run Round24ScaleMeasure first or
  * let this materialize the same directory.
  *
  * Run: sbt "Test/runMain graft.Round25ScaleMeasure [mult] [sfDir] [outDir]"
  */
object Round25ScaleMeasure {

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
      println(s"[r25scale] materialized ${mult}x embeddings at $outDir")
    }

    val TS = graft.similarity.TrainedState
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // serve legs: min of 3 timed reps — co-tenant bursts on this host
    // only ever ADD time (the Bench min-of-sweeps rationale), and a
    // single-rep serve number has already produced one 25x phantom
    def timedMin(f: => Unit): Double =
      (1 to 3).map(_ => timed(f)).min
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- legs 1+2: IVF / IVF-PQ serving ----
    def measureIvf(tag: String, dir: String)
        : (Double, Double, Double, Double) = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // corpus-scaled centroids: constant ~50-row cells at every scale
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      // IVF index (partition-pruned probes)
      val ivfPath = s"/tmp/graft_r25_ivf_$tag"
      TS.saveIvfIndex(graft.similarity.Similarity.ivfAssign(emb, cents),
        ivfPath)
      val ivfIdx = TS.loadIvfIndex(spark, ivfPath)
      def ivfOnce(): Unit = noop(graft.similarity.Similarity
        .ivfTopKFromIndex(probes, ivfIdx, k = 5, cents, nprobe = 3))
      ivfOnce()
      val ivfS = timedMin(ivfOnce())
      // IVF-PQ index (codes probes + float re-rank)
      val books = graft.similarity.ProductQuantizer.codebooks(
        emb, dim = 64, numSub = 8,
        stride = math.max(1L, emb.count() / 2000L).toInt)
        .localCheckpoint(true)
      val pqPath = s"/tmp/graft_r25_ivfpq_$tag"
      TS.saveIvfPqIndex(graft.similarity.IvfPq.encode(emb, cents, books,
        dim = 64, numSub = 8), pqPath)
      val pqIdx = TS.loadIvfPqIndex(spark, pqPath)
      def pqOnce(): Unit = noop(graft.similarity.IvfPq.topKFromIndex(
        probes, pqIdx, emb, k = 5, cents, books, dim = 64, numSub = 8,
        nprobe = 3, rerank = 32))
      pqOnce()
      val pqS = timedMin(pqOnce())
      // fixed-K dense cells: salted split vs one-file-per-cell
      val fixedCents = emb.filter(col("vec_id") < 6400)
        .filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val fixedAssigned = graft.similarity.Similarity
        .ivfAssign(emb, fixedCents).localCheckpoint(true)
      val onePath = s"/tmp/graft_r25_fixedk_one_$tag"
      val saltPath = s"/tmp/graft_r25_fixedk_salt_$tag"
      TS.saveIvfIndex(fixedAssigned, onePath) // default: no split here
      TS.saveIvfIndex(fixedAssigned, saltPath, targetRowsPerFile = 512L)
      def probeOnce(p: String): Unit = noop(graft.similarity.Similarity
        .ivfTopKFromIndex(probes, TS.loadIvfIndex(spark, p), k = 5,
          fixedCents, nprobe = 3))
      probeOnce(onePath); probeOnce(saltPath)
      val oneS = timedMin(probeOnce(onePath))
      val saltS = timedMin(probeOnce(saltPath))
      println(f"[r25scale] $tag ivf_search=$ivfS%.2fs ivfpq_search=$pqS%.2fs " +
        f"fixedk_onefile=$oneS%.2fs fixedk_salted=$saltS%.2fs")
      (ivfS, pqS, oneS, saltS)
    }

    // ---- leg 1b: TWO-LEVEL probe vs flat at corpus-scaled cells ----
    // if the flat probe's 100× growth is the O(|q|·C) query-side cell
    // ranking (C ∝ corpus), the two-level probe (S ≈ √C supers ranked,
    // then only the probed supers' members) should be ~flat — the
    // attribution AND the dial's value in one measurement
    def measureTwoLevel(tag: String, dir: String): Double = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val c = cents.count()
      val stride = math.max(1, math.round(math.sqrt(c.toDouble)).toInt)
      val supers = graft.similarity.Similarity
        .superCentroids(cents, stride).localCheckpoint(true)
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      val ivfIdx = TS.loadIvfIndexCached(spark, s"/tmp/graft_r25_ivf_$tag")
      // c2s staged once — index metadata, the production serving shape
      val c2s = graft.similarity.Similarity
        .centroidSuperMap(cents, supers).localCheckpoint(true)
      def once(): Unit = noop(graft.similarity.Similarity
        .ivfTopKFromIndexTwoLevel(probes, ivfIdx, k = 5, cents, supers,
          fanout = 8, nprobe = 3, c2sDf = Some(c2s)))
      once()
      val s = timedMin(once())
      println(f"[r25scale] $tag twolevel_probe=$s%.2fs (C=$c, " +
        f"S=${supers.count()})")
      s
    }

    // ---- leg 3: post-compaction flat-graph search ----
    // equal-density control: compaction re-saves at targetRowsPerFile
    // 4096 at BOTH scales (files ∝ rows), so post-compaction per-file
    // density is the constant the isin pruning contract needs
    def measureCompacted(tag: String, dir: String): Double = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val gPath = s"/tmp/graft_r25_graph_$tag"
      TS.saveGraphIndex(graft.similarity.Similarity.knnGraphAdjacent(
        graft.similarity.Similarity.ivfAssign(emb, cents), cents,
        k = 6, nprobe = 3), gPath)
      // a real fold-in generation, then the DATA-SIZED compaction
      val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
      val batch = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
          col("embedding")).localCheckpoint(true)
      val (_, chg) = graft.similarity.GraphAnn.insertBySearchParts(
        TS.loadGraphIndex(spark, gPath), emb, batch, entryId = 0L,
        beam = 8, hops = 6, degree = 6, batchBound = 50L)
      TS.appendGraphDelta(chg, gPath)
      TS.compactGraphIndex(spark, gPath, targetRowsPerFile = 4096L)
      val edges = TS.loadGraphIndex(spark, gPath)
      val corpus = emb.unionByName(batch)
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      def searchOnce(): Unit = noop(graft.similarity.GraphAnn.searchGraph(
        probes, edges, corpus, entryId = 0L, beam = 8, hops = 6, k = 5))
      searchOnce()
      val s = timedMin(searchOnce())
      println(f"[r25scale] $tag post_compaction_search=$s%.2fs " +
        f"(files=${new java.io.File(gPath).listFiles()
          .count(x => x.isFile && x.getName.endsWith(".parquet"))})")
      s
    }

    // ---- leg 4: persisted fold-in loop per-trigger cost ----
    def measureTrigger(tag: String, dir: String): Double = {
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val gPath = s"/tmp/graft_r25_trig_$tag"
      val vPath = s"$gPath.vectors"
      TS.saveGraphIndex(graft.similarity.Similarity.knnGraphAdjacent(
        graft.similarity.Similarity.ivfAssign(emb, cents), cents,
        k = 6, nprobe = 3), gPath)
      TS.saveVectors(emb, vPath)
      val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
      def trigger(offset: Long): Unit = {
        val batch = emb.filter(col("vec_id") < 50)
          .select((col("vec_id") + lit(offset)).as("vec_id"),
            col("embedding")).localCheckpoint(true)
        val corpus = TS.loadVectorsCached(spark, vPath)
        val edges = TS.loadGraphIndexCached(spark, gPath)
        val (_, chg) = graft.similarity.GraphAnn.insertBySearchParts(
          edges, corpus, batch, entryId = 0L, beam = 8, hops = 6,
          degree = 6, batchBound = 50L)
        TS.appendGraphDelta(chg, gPath)
        TS.appendVectorsDelta(batch, vPath)
      }
      trigger(maxId + 1) // warm
      val s = (2 to 4).map(i => timed(trigger(maxId + 100L * i))).min
      println(f"[r25scale] $tag fold_in_trigger=$s%.2fs")
      s
    }

    // R25_LEGS selects legs (comma list of ivf,compact,trigger) so a
    // 100× run fits a bounded wall-clock budget per invocation — the
    // materialized corpus and each leg's printed ratio are independent
    val legs = sys.env.getOrElse("R25_LEGS", "ivf,compact,trigger")
      .split(",").map(_.trim).toSet
    if (legs("ivf")) {
      val (i1, p1, o1, sa1) = measureIvf("sf01", sfDir)
      val (iN, pN, oN, saN) = measureIvf(s"sf_${mult}x", outDir)
      println(f"[r25scale] ${mult}x ratios: ivf_search=${iN / i1}%.2f " +
        f"(claim ~flat, corpus-scaled cells), ivfpq_search=${pN / p1}%.2f " +
        f"(claim ~flat), fixedk_onefile=${oN / o1}%.2f vs " +
        f"fixedk_salted=${saN / sa1}%.2f (dense-cell split)")
    }
    if (legs("twolevel")) {
      val t1 = measureTwoLevel("sf01", sfDir)
      val tN = measureTwoLevel(s"sf_${mult}x", outDir)
      println(f"[r25scale] ${mult}x ratios: twolevel_probe=${tN / t1}%.2f " +
        f"(claim ~flat — O(sqrt C) ranking)")
    }
    if (legs("compact")) {
      val c1 = measureCompacted("sf01", sfDir)
      val cN = measureCompacted(s"sf_${mult}x", outDir)
      println(f"[r25scale] ${mult}x ratios: " +
        f"post_compaction_search=${cN / c1}%.2f (claim ~flat — " +
        f"data-sized rewrite)")
    }
    if (legs("trigger")) {
      val t1 = measureTrigger("sf01", sfDir)
      val tN = measureTrigger(s"sf_${mult}x", outDir)
      println(f"[r25scale] ${mult}x ratios: fold_in_trigger=${tN / t1}%.2f " +
        f"(claim ~flat — batch-scaled)")
    }
    spark.stop()
  }
}
