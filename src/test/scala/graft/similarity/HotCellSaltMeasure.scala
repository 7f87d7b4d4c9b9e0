package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 verdict #8: validate the hot-cell SALTING knob
  * ([[TrainedState.saveIvfIndex]] `targetRowsPerFile`) in its CLAIMED
  * regime. The r15 leg measured a wash at ~3k-row cells (more files =
  * more task overhead than parallelism buys); the knob's stated regime
  * is multi-hundred-MB cells. This leg PLANTS the skew: a synthetic
  * assignment over the 100× corpus where cell 0 owns ~20% of all
  * vectors (≈10^6 rows ≈ 250 MB of floats), saved one-file-per-cell vs
  * salted, then times the hot cell's scan+score+rank — the exact
  * serving work a probe of that cell pays.
  *
  * Run Round25ScaleMeasure first (materializes /tmp/graft_sf100), then:
  *   sbt "Test/runMain graft.similarity.HotCellSaltMeasure"
  */
object HotCellSaltMeasure {
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the sf0.1 embeddings table is ~2k rows, so even the 100× corpus
    // gives only a 40k-row hot cell (measured: a wash — still below the
    // knob's regime). Materialize a 2500× corpus with the Round24/25
    // recipe: ~5M rows, hot cell ≈ 10^6 rows ≈ 250 MB of floats.
    val mult = args.headOption.map(_.toInt).getOrElse(2500)
    val outDir = s"/tmp/graft_sf$mult"
    if (!new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        .select(explode(sequence(lit(0), lit(mult - 1))).as("c"), col("*"))
        .withColumn("vec_id", col("vec_id") * mult + col("c"))
        .withColumn("embedding", transform(col("embedding"), (x, i) =>
          when(i === 0, x + col("c").cast("float") * lit(0.001f))
            .otherwise(x)))
        .drop("c")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[hotcell] materialized ${mult}x embeddings at $outDir")
    }
    val emb = graft.Tables.load(spark, outDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // planted skew: ~20% of the corpus lands in cell 0, the rest
    // spreads over 63 cold cells
    val assigned = emb.select(col("vec_id"),
      when(pmod(col("vec_id"), lit(5)) === 0, lit(0L))
        .otherwise(pmod(col("vec_id"), lit(63)) + 1L).as("centroid_id"),
      col("embedding"))
    val onePath = s"/tmp/graft_r31_hotcell_one_$mult"
    val saltPath = s"/tmp/graft_r31_hotcell_salt_$mult"
    if (!new java.io.File(onePath).exists())
      TrainedState.saveIvfIndex(assigned, onePath)
    if (!new java.io.File(saltPath).exists())
      TrainedState.saveIvfIndex(assigned, saltPath,
        targetRowsPerFile = 65536L)
    val q = emb.filter(col("vec_id") === 5L)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    def hotScan(path: String): Unit = {
      val idx = TrainedState.loadIvfIndex(spark, path)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      noop(idx.filter(col("centroid_id") === 0L)
        .select(col("vec_id").as("neighbor_id"), col("embedding"))
        .crossJoin(broadcast(q))
        .withColumn("cos_sim",
          Similarity.cosineGuarded(col("q_emb"), col("embedding")))
        .withColumn("rank",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 5))
    }
    def files(p: String): Int = {
      val d = new java.io.File(s"$p/centroid_id=0")
      if (!d.exists()) 0
      else d.listFiles().count(f => f.isFile &&
        f.getName.endsWith(".parquet"))
    }
    hotScan(onePath); hotScan(saltPath) // warm page cache + codegen
    val t1 = timedMin(hotScan(onePath))
    val tS = timedMin(hotScan(saltPath))
    val hotRows = assigned.filter(col("centroid_id") === 0L).count()
    println(f"[hotcell] hot_cell_rows=$hotRows " +
      f"onefile=${t1}%.2fs (files=${files(onePath)}) " +
      f"salted=${tS}%.2fs (files=${files(saltPath)}) " +
      f"speedup=${t1 / tS}%.2fx (claim: salted wins at ~10^6-row cells " +
      "— the r15 3k-row wash was below the knob's regime)")
    spark.stop()
  }
}
