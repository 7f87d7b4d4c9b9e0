package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset delivery: write a corpus as JSONL shards with DETERMINISTIC
  * shard assignment and a verifiable manifest — the materialization step
  * at the end of a training-data pipeline (trainers consume fixed shard
  * sets; reproducible assignment means a re-export after an upstream fix
  * moves only the documents that changed).
  *
  * Shard assignment is the repo's engine-portable convention: a 16-bit
  * md5 draw on the id modulo `numShards` — no RNG, no engine hash, so
  * the manifest is DuckDB-oracle-checkable and any single document's
  * shard is computable by hand.
  *
  * Scale design: assignment is map-only; the write repartitions BY the
  * shard column so each shard is produced by exactly one task
  * (`partitionBy` on disk layout, one file per shard — trainers want
  * stable file identity, not Spark's default many-part spray). The
  * manifest is one aggregation over the assigned frame.
  */
object Export {

  /** The deterministic shard id for `idCol`. */
  def shardOf(idCol: org.apache.spark.sql.Column,
              numShards: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("shard:"),
      idCol.cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("long") % numShards

  /** Per-shard manifest WITHOUT writing: `(shard, n_rows)` plus any
    * caller aggregates are derivable by joining on shard. */
  def manifest(df: DataFrame, idCol: String, numShards: Int): DataFrame =
    df.select(shardOf(col(idCol), numShards).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))

  /** Write JSONL shards under `path` (`shard=<k>/part-…`, one file per
    * shard) and return the written manifest `(shard, n_rows)`. All
    * columns of `df` serialize via `to_json(struct(*))` in field order.
    */
  def jsonlShards(df: DataFrame, idCol: String, path: String,
                  numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards=$numShards must be >= 1")
    val assigned = df
      .withColumn("shard", shardOf(col(idCol), numShards))
      .withColumn("line",
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .select(col("shard"), col("line"))
    assigned
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"))
      .write.mode("overwrite").partitionBy("shard").text(path)
    // manifest from what was WRITTEN — read back (partition discovery
    // recovers the shard column from the directory layout), so the
    // receipt can never disagree with the artifact
    df.sparkSession.read.text(path)
      .select(col("shard").cast("long").as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
  }
}
