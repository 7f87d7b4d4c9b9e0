package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution harness for the r13 `e_ann_graph_incremental` min-of-reps
  * regression (driver artifact: 3.28 s → 14.64 s): the round added one
  * guard count job per flat walk (`GraphAnn.walkLoop`'s seed gate), and
  * the query runs two walks (the insert's search + the serve). This
  * measures the SAME lifecycle at the bench SF with the r13 behavior
  * (no caller bound → the walk pays its guard count) and the r14 path
  * (caller-known bounds → no guard job), with Spark job counts, on
  * whatever window it runs in — so the regression is attributable to
  * either the guard count (job delta × measurable cost) or host noise
  * (identical jobs, divergent wall-clock). Results → NOTES.md.
  *
  * Run: `sbt "Test/runMain graft.IncrementalAttribution"`
  */
object IncrementalAttribution {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })

    // the e_ann_graph_incremental body (Round19Queries), bounds dialable
    def once(bounded: Boolean): (Double, Int) = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val j0 = jobCount.get()
      val base = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      val edges = graft.similarity.Similarity.bruteTopK(base, base, 6)
        .localCheckpoint(true)
      val planted = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val bb = if (bounded) 20L else -1L
      val updated = graft.similarity.GraphAnn.insertBySearch(
        edges, base, planted, entryId = 0L, beam = 64, hops = 64,
        degree = 6, batchBound = bb).localCheckpoint(true)
      val full = base.unionByName(planted)
      graft.similarity.GraphAnn.searchGraph(
          base.filter(col("vec_id") < 20), updated, full,
          entryId = 0L, beam = 84, hops = 64, k = 1,
          queryBound = bb)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain before reading the count
      (t, jobCount.get() - j0)
    }

    once(bounded = false) // warmup (JIT + parquet footers)
    once(bounded = true)
    val offs = (1 to 3).map(_ => once(bounded = false))
    val ons = (1 to 3).map(_ => once(bounded = true))
    offs.zipWithIndex.foreach { case ((t, j), i) =>
      println(f"[attr] unbounded(r13-shape) rep${i + 1} time=$t%7.3f s jobs=$j") }
    ons.zipWithIndex.foreach { case ((t, j), i) =>
      println(f"[attr] bounded  (r14-shape) rep${i + 1} time=$t%7.3f s jobs=$j") }
    println(f"[attr] min unbounded=${offs.map(_._1).min}%.3f s " +
      f"(jobs=${offs.map(_._2).min}) min bounded=${ons.map(_._1).min}%.3f s " +
      f"(jobs=${ons.map(_._2).min}) sf=$sfDir")
    spark.stop()
  }
}
