package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (not a spec): job-count + phase timing for the
  * e_ann_hnsw_repair shape, to attribute its bench cost between index
  * construction, lifecycle construction-time actions, and the final
  * materialization. Run: `sbt "Test/runMain graft.similarity.RepairProbeMeasure"`. */
object RepairProbeMeasure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val dir = "/root/testdata/sf0.1"
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get() - j0}")
      r
    }
    // warm-up rep then measured rep
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val corpus = phase("corpus") {
        graft.Tables.load(spark, dir, "embeddings")
          .filter(col("vec_id") < 60)
          .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      }
      val n = corpus.count().toInt
      val lv = phase("levels") {
        Hnsw.levels(corpus, m = 4, maxLevel = 2).localCheckpoint(true) }
      val del = phase("del") {
        val upper2 = lv.filter(col("level") >= 1).orderBy(col("vec_id"))
          .limit(2).collect().map(_.getLong(0)).toSeq
        val low1 = lv.filter(col("level") === 0).agg(min(col("vec_id")))
          .collect()(0).getLong(0)
        (upper2 :+ low1 :+ 999999L).toDF("vec_id").localCheckpoint(true)
      }
      val layered = phase("buildIndex") {
        Hnsw.buildIndex(corpus, degree = 4, m = 4, maxLevel = 2)
          .localCheckpoint(true)
      }
      val repaired = phase("forgetRepaired construct") {
        Hnsw.forgetRepaired(layered, corpus, del, maxLevel = 2,
          beam = n, hops = n, degree = 4)._1
      }
      val affectedPairs = (0 to 2).map { l =>
        layered.filter(col("layer") === l)
          .join(del.withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"))
          .join(del.withColumnRenamed("vec_id", "query_id"),
            Seq("query_id"), "left_anti")
          .select(lit(l).as("layer"), col("query_id")).distinct()
      }.reduce(_.unionByName(_))
      val out = repaired.join(affectedPairs, Seq("layer", "query_id"),
          "left_semi")
        .select(col("layer"), col("query_id"), col("rank"),
          col("neighbor_id"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("layer"), col("query_id"), col("rank"))
      phase("final noop write") {
        out.write.format("noop").mode("overwrite").save()
      }
      // single-layer decomposition (layer 0)
      val layerEdges = layered.filter(col("layer") === 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos_sim"))
      val ids = broadcast(del.select(col("vec_id")).distinct())
      val live = corpus.join(ids, Seq("vec_id"), "left_anti")
      val kept = phase("  graphForget") {
        GraphAnn.graphForget(layerEdges, del)._1 }
      val affected = phase("  affectedSources + isEmpty") {
        val a = GraphAnn.affectedSources(layerEdges, ids)
        a.isEmpty; a
      }
      val surv = phase("  surv elect") {
        layerEdges.join(ids.withColumnRenamed("vec_id", "query_id"),
            Seq("query_id"), "left_anti")
          .agg(min(col("query_id"))).collect()(0).getLong(0)
      }
      phase("  graphRepair (walk + slice)") {
        GraphAnn.graphRepair(kept, live, affected, surv, n, n, 4)
      }
      phase("  receipts (lazy)") {
        GraphAnn.forgetRepairReceipts(layerEdges, del)
      }
    }
    spark.stop()
  }
}
