package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness for SCALE.md (round-7/15 operators):
  * wall-clock at 1× and N× inputs for boilerplate strip, the two
  * kNN-graph probe forms, and filtered ANN. Documents blow up by doc
  * copies (the SelectionScaleMeasure methodology); embeddings blow up
  * by perturbed copies with DENSE re-ids, so the stride-50 centroid
  * rule scales the CELL COUNT with the corpus while cell sizes stay
  * ~constant — the production discipline after ivfRebalance, and
  * exactly the regime where the per-vector walk's n×C term goes
  * quadratic while the adjacency form stays linear.
  * Run: sbt "Test/runMain graft.similarity.Round15ScaleMeasure [docMult] [embMult] [sfDir]"
  */
object Round15ScaleMeasure {
  def main(args: Array[String]): Unit = {
    val docMult = args.headOption.map(_.toInt).getOrElse(50)
    val embMult = args.lift(1).map(_.toInt).getOrElse(20)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag: String)(f: => DataFrame): Unit = {
      // unpersist only blocks the operator itself staged — the shared
      // input checkpoints must survive across runs within an iteration
      val before = spark.sparkContext.getPersistentRDDs.keySet
      f.write.format("noop").mode("overwrite").save() // warm JIT
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[r15scale] $tag wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
    }

    // --- documents: boilerplate strip ---------------------------------
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def docCorpus(n: Int): DataFrame =
      (if (n == 1) docs
       else docs.select(
         explode(sequence(lit(0), lit(n - 1))).as("c"),
         col("doc_id"), col("text"))
         .select((col("doc_id") * n + col("c")).as("doc_id"),
           concat(col("text"), lit(" copymark"), col("c").cast("string"))
             .as("text")))
        .repartition(32).localCheckpoint(true)
    for (n <- Seq(1, docMult)) {
      val d = docCorpus(n)
      run(s"boilerplate_strip x$n") {
        graft.text.Boilerplate.strip(d, "doc_id", "text")
      }
      run(s"lm_backoff x$n") {
        val (tri, bi, uni, total) = graft.text.NgramLm.fitBackoff(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        graft.text.NgramLm.scoreBackoffWith(d, "doc_id", "text",
          tri, bi.localCheckpoint(true), uni, total)
      }
      run(s"retrieval_topk x$n") {
        val (p, t, dl, st) = graft.text.Retrieval.buildIndex(
          d, "doc_id", "text")
        val qs = spark.createDataFrame(Seq(
          (1L, Seq("stream", "filter", "merge")),
          (2L, Seq("table", "scan")),
          (3L, Seq("vector", "spark", "batch"))))
          .toDF("query_id", "terms")
        graft.text.Retrieval.topK(qs, p, t, dl, st, 10)
      }
      run(s"winnow x$n") {
        graft.text.Fingerprint.winnow(d, "doc_id", "text", 12, 5)
      }
      // copymark suffixes make the blown-up copies near- but not
      // exact-dups; overlap still pairs them (winnowing is local), so
      // this measures the pair stage under a real quadratic load —
      // with and without the skew cap
      run(s"winnow_overlap x$n") {
        graft.text.Fingerprint.overlapPairs(
          graft.text.Fingerprint.winnow(d, "doc_id", "text", 12, 5),
          "doc_id", minShared = 5, maxBucket = 64)
      }
      run(s"sft_mask x$n") {
        graft.text.SftOps.flattenWithMask(
          graft.text.SftOps.toTurns(d, "doc_id", "text", 12), "doc_id")
      }
    }

    // --- embeddings: kNN graph (both forms) + filtered ANN ------------
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    def embCorpus(n: Int): DataFrame =
      (if (n == 1) emb.select(col("vec_id"), col("embedding"), col("label"))
       else emb.select(
         explode(sequence(lit(0), lit(n - 1))).as("c"),
         col("vec_id"), col("embedding"), col("label"))
         .select((col("vec_id") * n + col("c")).as("vec_id"),
           // deterministic direction perturbation (cosine is
           // scale-invariant, so scaling alone would plant n-way ties)
           transform(col("embedding"), (x, i) =>
             when(i === 0, x + col("c").cast("float") * lit(0.001f))
               .otherwise(x)).as("embedding"),
           col("label")))
        .repartition(32).localCheckpoint(true)
    for (n <- Seq(1, embMult)) {
      val e = embCorpus(n)
      val cents = e.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
        .localCheckpoint(true)
      val index = Similarity
        .ivfAssignWith(e, cents, Seq("label")).localCheckpoint(true)
      run(s"knn_graph_walk x$n") {
        Similarity.knnGraph(index, cents, k = 3, nprobe = 2)
      }
      run(s"knn_graph_adjacent x$n") {
        Similarity.knnGraphAdjacent(index, cents, k = 3, nprobe = 2)
      }
      run(s"ann_filtered x$n") {
        Similarity.ivfTopKFiltered(
          // dense re-ids keep this a constant 50-query batch at any n —
          // the measurement isolates INDEX-side scaling
          e.filter(col("vec_id") < 50).select(col("vec_id"), col("embedding")),
          index, col("label") === 3, k = 3, cents, minCandidates = 12)
      }
    }
    spark.stop()
  }
}
