package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.TrainedState

/** The PRODUCTION caller for the deletion CONSOLIDATION half
  * ([[TrainedState.consolidateGraphArtifact]] /
  * [[TrainedState.consolidateHnswArtifact]]) — the schedulable job a
  * lazily-deleting fleet ([[graft.streaming.StreamingAnn
  * .forgetGraphPersisted]] / `forgetHnswPersisted`) runs on a
  * maintenance cadence: it detects the artifact kind, repairs every
  * surviving out-list that lost an edge to a deleted id, rewrites the
  * edge base (crash-safe, data-sized), and then folds the vector
  * tombstones out of the bytes ([[TrainedState.compactVectors]]), so
  * one invocation returns the PAIR to as-if-never-ingested state.
  *
  * ```
  * runMain graft.tools.ConsolidateAnn <indexPath> [entryId] [beam]
  *   [hops] [degree] [vectorsPath] [receiptsPath]
  * ```
  *
  * `entryId` is required for a FLAT graph (repairs route through it —
  * a tool cannot guess a deployment's entry); the LAYERED kind ignores
  * it (per-layer election). `degree` defaults to the artifact's own
  * max rank — the degree it was built with. Receipts print as one
  * JSON line per deleted id and append to `receiptsPath` (parquet,
  * stamped) when given — the [[MaintainRoot]] audit-trail convention.
  *
  * TOMBSTONE-COMPLETE kinds (ivf / ivfpq / pqcodes / vectors /
  * tokens — the [[TrainedState.forgetIvfDelta]]-family artifacts)
  * need no repair: their deletion is already correct at the tombstone,
  * so "consolidation" is the physical half alone — compact the
  * artifact (folding the tombstones out of the bytes) plus the
  * sibling vectors artifact when one exists. `entryId`/`beam`/`hops`/
  * `degree` are ignored and the receipt set is empty (nothing was
  * repaired; the compaction is the whole act).
  */
object ConsolidateAnn {

  /** One consolidation; returns (kind, receipt rows). Factored out so
    * the e2e spec drives the exact production path. */
  def run(spark: SparkSession, indexPath: String, entryId: Option[Long],
          beam: Int, hops: Int, degree: Option[Int],
          vectorsPath: Option[String], receiptsPath: Option[String])
      : (String, Seq[org.apache.spark.sql.Row]) = {
    val vecPath = vectorsPath.getOrElse(s"$indexPath.vectors")
    val kind = TrainedState.detectArtifactKind(spark, indexPath)
    require(kind.isDefined,
      s"ConsolidateAnn: $indexPath is unclassifiable — refusing to " +
        "touch an artifact whose layout cannot be identified")
    if (!Set("graph", "hnsw").contains(kind.get)) {
      // tombstone-complete kind: no dangling edges, nothing to repair —
      // fold the tombstones out of the bytes and return
      TrainedState.compactorFor(kind.get)(spark, indexPath)
      val vp = new org.apache.hadoop.fs.Path(vecPath)
      val fs = vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (vecPath != indexPath && fs.exists(vp))
        TrainedState.compactVectors(spark, vecPath)
      return (kind.get, Seq.empty)
    }
    val deg = degree.getOrElse {
      val d = (if (kind.contains("hnsw"))
                 TrainedState.loadHnswIndex(spark, indexPath)
               else TrainedState.loadGraphIndex(spark, indexPath))
        .agg(max(col("rank"))).head
      require(!d.isNullAt(0), s"ConsolidateAnn: $indexPath has no edges")
      d.getInt(0)
    }
    val receipts = kind.get match {
      case "graph" =>
        require(entryId.isDefined,
          "ConsolidateAnn: a flat graph consolidation needs the " +
            "deployment's entryId (repairs route through it)")
        TrainedState.consolidateGraphArtifact(spark, indexPath, vecPath,
          entryId.get, beam, hops, deg)
      case "hnsw" =>
        TrainedState.consolidateHnswArtifact(spark, indexPath, vecPath,
          beam, hops, deg)
    }
    // fold the vector tombstones out of the bytes in the same stroke
    TrainedState.compactVectors(spark, vecPath)
    val rows = receipts.collect().toSeq
    val at = java.time.Instant.now().toString
    rows.foreach { r =>
      println(s"""{"vec_id":${r.getLong(0)},"n_out_removed":${r.getLong(1)},"n_in_removed":${r.getLong(2)},"was_indexed":${r.getBoolean(3)},"n_repaired":${r.getLong(4)},"consolidated_at":"$at"}""")
    }
    receiptsPath.foreach { p =>
      import spark.implicits._
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getLong(4), at))
        .toDF("vec_id", "n_out_removed", "n_in_removed", "was_indexed",
          "n_repaired", "consolidated_at")
        .repartition(1)
        .write.mode("append").parquet(p)
    }
    (kind.get, rows)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ConsolidateAnn <indexPath> [entryId] " +
      "[beam] [hops] [degree] [vectorsPath] [receiptsPath]")
    val indexPath = args(0)
    val entryId = args.lift(1).map(_.toLong)
    val beam = args.lift(2).map(_.toInt).getOrElse(32)
    val hops = args.lift(3).map(_.toInt).getOrElse(16)
    val degree = args.lift(4).map(_.toInt)
    val vectorsPath = args.lift(5)
    val receiptsPath = args.lift(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, indexPath, entryId, beam, hops, degree, vectorsPath,
      receiptsPath)
    finally spark.stop()
    ()
  }
}
