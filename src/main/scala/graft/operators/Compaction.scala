package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance operator every
  * long-running 100TB lakehouse needs: streaming ingest and fine-grained
  * partitioning both strew thousands of KB-sized parquet files, and scan
  * cost at scale is dominated by per-file open/footer overhead long before
  * bytes matter. Compaction rewrites a table into ~`targetRecordsPerFile`
  * row files, optionally sorted so min/max footer stats turn into real
  * file-skipping (pair with [[graft.functions.ZOrder]] keys for
  * multi-dimensional skipping).
  */
object Compaction {

  /** Rewrite `df` under `outPath` as ≈⌈n / targetRecordsPerFile⌉ files.
    *
    * Mechanics: one shuffle of the table — with `sortCols`,
    * `repartitionByRange` on those columns (sampled range bounds → each
    * FILE owns a narrow, disjoint slice of the sort domain, so parquet
    * min/max footer stats actually skip files; a round-robin shuffle plus
    * within-file sort would leave every file spanning the full domain and
    * skip nothing), then `sortWithinPartitions` for row-group-level stats
    * inside each file. Without `sortCols`, plain round-robin for even file
    * sizes regardless of input skew. `maxRecordsPerFile` is the
    * belt-and-braces cap so a future append through the same writer can't
    * silently regrow jumbo files.
    *
    * Returns the file count written (validated in CompactionSpec) —
    * ≥ ⌈n/target⌉, and slightly more when a sampled range bound overfills
    * a partition and the `maxRecordsPerFile` cap splits it.
    */
  def compact(df: DataFrame, outPath: String, targetRecordsPerFile: Long,
              sortCols: Seq[String] = Nil): Long = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val n = df.count()
    val numFiles = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val sorted =
      if (sortCols.isEmpty) df.repartition(numFiles)
      else df.repartitionByRange(numFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    sorted.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(outPath)
    // Hadoop FS, not java.io.File: the writer accepts any scheme the
    // session's filesystems do (file:, hdfs:, s3a:), so the count must too
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet")).toLong
  }
}
