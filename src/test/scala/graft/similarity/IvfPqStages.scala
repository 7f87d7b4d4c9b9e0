package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level attribution for the IVF-PQ serve residual (SCALE.md
  * r15): times the three actions of [[IvfPq.topKFromIndex]] SEPARATELY
  * against the saved Round25 artifacts at both scales —
  *
  *   s1  probe ranking (the |q|·C localize collect)
  *   s2  ADC candidates → shortlist (statically-pruned code scan +
  *       broadcast ADC + fold + window, collected at the shortlist cap)
  *   s3  exact rerank (id-pruned float fetch + final window)
  *
  * so a 100× growth lands on a stage, not a guess. Run the Round25
  * ivf leg first to materialize the artifacts and the 100× corpus.
  *
  * Run: sbt "Test/runMain graft.similarity.IvfPqStages" */
object IvfPqStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timedMin(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    val dot = graft.functions.DotProduct.dot_product _
    val dim = 64; val numSub = 8; val subDim = dim / numSub
    val k = 5; val nprobe = 3; val rerank = 32
    for ((tag, dir) <- Seq(("sf01", "/root/testdata/sf0.1"),
        ("sf_100x", "/tmp/graft_sf100"))) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")).localCheckpoint(true)
      val books = ProductQuantizer.codebooks(emb, dim, numSub,
        stride = math.max(1L, emb.count() / 2000L).toInt)
        .localCheckpoint(true)
      val probes = emb.filter(col("vec_id") < 200)
        .filter(pmod(col("vec_id"), lit(10)) === 0).localCheckpoint(true)
      val index = TrainedState.loadIvfPqIndex(spark,
        s"/tmp/graft_r25_ivfpq_$tag")

      // s1: probe ranking → localized rows
      val w0 = Window.partitionBy(col("vec_id"))
        .orderBy(col("_cdist").asc, col("centroid_id"))
      val probedPlan = probes.crossJoin(broadcast(cents))
        .withColumn("_cdist",
          Similarity.negCosGuarded(col("embedding"), col("centroid")))
        .withColumn("_crank", row_number().over(w0))
        .filter(col("_crank") <= nprobe)
        .select(col("vec_id").as("query_id"), col("centroid_id"),
          col("embedding").as("q_emb"))
      def s1(): Unit = { probedPlan.limit(4097).collect(); () }
      s1(); val t1 = timedMin(s1())
      val probed = Similarity.localizeBounded(probedPlan, 1 << 12)

      // s2: ADC candidates → shortlist collect
      val adc = broadcast(probed.select(col("query_id"), col("q_emb"))
        .dropDuplicates("query_id")
        .select(col("query_id"),
          explode(transform(sequence(lit(0), lit(numSub - 1)),
            s => struct(s.as("sub"),
              slice(col("q_emb"), s * subDim + 1, lit(subDim)).as("subvec"))))
            .as("_e"))
        .select(col("query_id"), col("_e.sub").as("sub"),
          col("_e.subvec").as("subvec"))
        .join(broadcast(books), Seq("sub"))
        .select(col("query_id"), col("sub"), col("code"),
          dot(col("subvec"), col("centroid")).as("part")))
      val cand = Similarity.joinProbedCells(index,
          probed.select("query_id", "centroid_id"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .join(adc, Seq("query_id", "sub", "code"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sort_array(collect_list(struct(col("sub"), col("part"))))
          .as("_ps"))
        .filter(size(col("_ps")) === numSub)
        .withColumn("adc_score",
          aggregate(col("_ps"), lit(0.0), (a, x) => a + x.getField("part")))
      val wAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("adc_score").desc, col("vec_id"))
      val shortlistPlan = cand.withColumn("_r", row_number().over(wAdc))
        .filter(col("_r") <= k * rerank)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      def s2(): Unit = { shortlistPlan.limit(1 << 17).collect(); () }
      s2(); val t2 = timedMin(s2())
      val shortlist = Similarity.localizeBounded(shortlistPlan, 1 << 17)

      // s2f: the r16 FUSED candidate stage (AdcLut codegen expression in
      // place of the explode→join→groupBy→fold above) — same probed
      // rows, same index, same shortlist cut
      val probedRows = probed.collect()
      val booksRows = books.select(col("sub").cast("int"),
        col("code").cast("int"), col("centroid")).collect()
      val luts = graft.functions.AdcLut.build(probedRows,
        probed.schema.fieldIndex("query_id"),
        probed.schema.fieldIndex("q_emb"), booksRows, numSub, subDim)
      val candFused = Similarity.joinProbedCells(index,
          probed.select("query_id", "centroid_id"))
        .filter(col("query_id") =!= col("vec_id"))
        .filter(graft.functions.AdcLut.adc_keep(
          col("query_id"), col("codes"), luts))
        .select(col("query_id"), col("vec_id"),
          graft.functions.AdcLut.adc_score(
            col("query_id"), col("codes"), luts).as("adc_score"))
      val shortlistFusedPlan = candFused
        .withColumn("_r", row_number().over(wAdc))
        .filter(col("_r") <= k * rerank)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      def s2f(): Unit = { shortlistFusedPlan.limit(1 << 17).collect(); () }
      s2f(); val t2f = timedMin(s2f())

      // s3: exact rerank from the localized shortlist
      val q = broadcast(probes.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb")))
      val scored = Similarity.shortlistEmbeddings(shortlist, emb)
        .join(q, Seq("query_id"))
        .withColumn("cos_sim",
          Similarity.cosineGuarded(col("q_emb"), col("c_emb")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      val finalPlan = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos_sim"))
      def s3(): Unit = finalPlan.write.format("noop")
        .mode("overwrite").save()
      s3(); val t3 = timedMin(s3())

      // e2e: the real serve call, same artifacts, same window — the
      // number the staged sum must reconcile against
      def e2e(): Unit = IvfPq.topKFromIndex(probes, index, emb, k,
          cents, books, dim, numSub, nprobe, rerank)
        .write.format("noop").mode("overwrite").save()
      e2e(); val te = timedMin(e2e())
      println(f"[ivfpq-stages] $tag s1_probe=$t1%.3fs s2_adc=$t2%.3fs " +
        f"s2_fused=$t2f%.3fs s3_rerank=$t3%.3fs e2e=$te%.3fs")
    }
    spark.stop()
  }
}
