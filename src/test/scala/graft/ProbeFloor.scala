package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution micro-measure for the r15 IVF probe floor (SCALE.md):
  * times a STATIC cell prune (literal filter — compile-time partition
  * pruning) against the saved Round25 IVF artifacts at both scales.
  * The ~flat 0.1-0.2 s result at 4000 cells is what exonerated the
  * partitioned layout and convicted the dynamic-partition-pruning
  * probe-join shape — the experiment behind
  * [[graft.similarity.Similarity.joinProbedCells]]. Run the Round25
  * ivf leg first to materialize the artifacts.
  *
  * Run: sbt "Test/runMain graft.ProbeFloor" */
object ProbeFloor {
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
    for (tag <- Seq("sf01", "sf_100x")) {
      val idx = graft.similarity.TrainedState.loadIvfIndex(spark,
        s"/tmp/graft_r25_ivf_$tag")
      // static single-cell prune: zero query-side work, one cell read
      def one(): Unit = { idx.filter(col("centroid_id") === 0L)
        .agg(count(lit(1))).collect(); () }
      one()
      val t1 = timedMin(one())
      // 60-cell static prune (the probe workload's scan shape)
      val cells = (0L until 3000L by 50L).toSeq
      def sixty(): Unit = { idx.filter(col("centroid_id")
        .isin(cells: _*)).agg(count(lit(1))).collect(); () }
      sixty()
      val t60 = timedMin(sixty())
      println(f"[floor] $tag one_cell=$t1%.3fs sixty_cells=$t60%.3fs")
    }
    spark.stop()
  }
}
