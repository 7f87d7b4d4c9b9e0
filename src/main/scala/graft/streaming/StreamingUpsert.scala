package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming snapshot maintenance: fold a CDC change stream into a keyed
  * parquet snapshot with [[graft.operators.Upsert]] MERGE semantics —
  * the continuously-updated corpus table (latest doc version by id,
  * feature table by entity) without a table format dependency.
  *
  * Mechanics per micro-batch (`foreachBatch` — the change stream is
  * small per trigger; the merge itself is the batch operator, so the
  * value semantics are the oracled `d_merge_cdc` contract):
  *
  *   1. within-batch last-writer-wins: changes are deduped per key by
  *      `orderCol` DESC (a CDC stream can carry several versions of one
  *      key per trigger; MERGE requires a key-unique source)
  *   2. merge into the current snapshot version
  *   3. write `v=<batchId>` under `snapshotDir`, then atomically swap
  *      the `_LATEST` pointer file (write tmp + rename). Readers resolve
  *      the pointer → they always see a COMPLETE version, never a
  *      half-written directory.
  *
  * Exactly-once: a retried batch recomputes from the same predecessor
  * version — `v=<batchId>` is overwritten idempotently and the pointer
  * swap is a no-op repeat (spec'd by double-applying a batch id). The
  * pointer rename is atomic on HDFS-like filesystems; on S3-like stores
  * front it with a conditional-put catalog entry.
  *
  * At scale the merge is the single full-outer join of [[graft.operators
  * .Upsert]]; writing the full snapshot per trigger is the format-free
  * trade (copy-on-write) — trigger intervals are minutes for corpus
  * maintenance, and the rewrite is partition-parallel. Readers needing
  * second-level freshness should take the change stream directly.
  */
object StreamingUpsert {

  private val Latest = "_LATEST"

  /** Resolve the current snapshot version directory, if any. */
  def latestVersion(spark: SparkSession, snapshotDir: String)
      : Option[String] = {
    val fs = new Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(snapshotDir, Latest)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val v = scala.io.Source.fromInputStream(in).mkString.trim
        if (v.isEmpty) None else Some(v)
      } finally in.close()
    }
  }

  /** Read the current snapshot (empty-schema-safe: None until the first
    * batch commits). */
  def readSnapshot(spark: SparkSession, snapshotDir: String)
      : Option[DataFrame] =
    latestVersion(spark, snapshotDir).map { v =>
      spark.read.parquet(new Path(snapshotDir, v).toString)
    }

  /** The committed version a given batch must merge INTO: the largest
    * `v=<id>` with id < batchId. NOT the `_LATEST` pointer — if batch N
    * crashed after swapping the pointer, a retry reading "latest" would
    * merge N's changes into N's own output, and a WHEN-MATCHED DELETE
    * would resurrect (the deleted key is unmatched on the second pass and
    * re-inserts). Versions below the retrying batch are complete by the
    * engine's in-order batch contract, so this read is always a full
    * snapshot. */
  def versionBefore(spark: SparkSession, snapshotDir: String,
                    batchId: Long): Option[String] = {
    val fs = new Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(snapshotDir)
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)
      .filter(_ < batchId)
      .sorted.lastOption
      .map(id => s"v=$id")
  }

  /** Apply one change batch to the snapshot — the unit a retried
    * micro-batch re-runs idempotently (public for direct use and for the
    * retry spec). */
  def applyBatch(spark: SparkSession, changes: DataFrame, batchId: Long,
                 snapshotDir: String, keys: Seq[String], orderCol: String,
                 deleteCond: Option[Column]): Unit = {
    // deterministic last-writer-wins even under orderCol ties: the
    // remaining payload breaks ties (struct ordering), so a retried
    // batch always picks the SAME winner
    val payload = changes.columns
      .filterNot(c => keys.contains(c) || c == orderCol).toSeq
    val tieBreak =
      if (payload.isEmpty) Nil
      else Seq(struct(payload.map(col): _*).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreak: _*)
    val deduped = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val merged = versionBefore(spark, snapshotDir, batchId)
      .map(v => spark.read.parquet(new Path(snapshotDir, v).toString))
      match {
      case Some(snap) =>
        graft.operators.Upsert.merge(snap, deduped, keys, deleteCond)
      // bootstrap: everything is an unmatched insert; a matched-only
      // delete condition cannot apply
      case None => deduped
    }
    val vDir = s"v=$batchId"
    merged.write.mode("overwrite")
      .parquet(new Path(snapshotDir, vDir).toString)
    val fs = new Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(snapshotDir, s"$Latest.tmp")
    val out = fs.create(tmp, true)
    try out.write(vDir.getBytes("UTF-8")) finally out.close()
    fs.delete(new Path(snapshotDir, Latest), false)
    fs.rename(tmp, new Path(snapshotDir, Latest))
  }

  /** Start the maintenance query on a streaming `changes` frame. */
  def maintain(changes: DataFrame, snapshotDir: String,
               checkpointDir: String, keys: Seq[String], orderCol: String,
               deleteCond: Option[Column] = None): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, batchId, snapshotDir, keys,
          orderCol, deleteCond)
      }
      .start()
}
