package graft.tools

import org.apache.spark.sql.SparkSession

import graft.similarity.TrainedState

/** The PRODUCTION caller for [[TrainedState.maintainRoot]] — the
  * root-sweeping index-maintenance pass as a schedulable job (cron /
  * workflow step / post-ingest hook), closing the "spec-only, no
  * production caller" gap: a fleet with a directory of persisted ANN
  * artifacts runs this on a schedule and every artifact whose claimed
  * generation count reached the policy threshold compacts with its
  * kind's crash-safe compactor — no human picks compactors, no serving
  * loop has to own artifacts it didn't write.
  *
  * ```
  * runMain graft.tools.MaintainRoot <root> [maxGenerations] [receiptsPath]
  * ```
  *
  * Receipts go to stdout as one JSON line per artifact (kind,
  * generations at inspection, whether this sweep compacted) and, when
  * `receiptsPath` is given, APPEND as parquet rows stamped with the
  * sweep time — the durable audit trail a fleet's monitoring reads
  * (e.g. "artifact X has sat at kind=None for a week" is the loud
  * signal that something unclassifiable is accumulating generations).
  */
object MaintainRoot {

  /** One sweep; returns the receipts. Factored out of [[main]] so the
    * e2e spec drives the exact production path (session handling
    * aside). */
  def run(spark: SparkSession, root: String, maxGenerations: Long,
          receiptsPath: Option[String]): Seq[TrainedState.MaintenanceReceipt] = {
    val receipts = TrainedState.maintainRoot(spark, root, maxGenerations)
    val sweptAt = java.time.Instant.now().toString
    receipts.foreach { r =>
      println(s"""{"path":"${r.path}","kind":${r.kind
        .map(k => s""""$k"""").getOrElse("null")},"generations":${r.generations},"compacted":${r.compacted},"swept_at":"$sweptAt"}""")
    }
    receiptsPath.foreach { p =>
      import spark.implicits._
      receipts.map(r => (r.path, r.kind.orNull, r.generations,
          r.compacted, sweptAt))
        .toDF("path", "kind", "generations", "compacted", "swept_at")
        .repartition(1)
        .write.mode("append").parquet(p)
    }
    receipts
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: MaintainRoot <root> [maxGenerations] [receiptsPath]")
    val root = args(0)
    val maxGen =
      if (args.length > 1) args(1).toLong
      else TrainedState.DefaultMaxGenerations
    val receiptsPath = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, root, maxGen, receiptsPath)
    finally spark.stop()
    ()
  }
}
