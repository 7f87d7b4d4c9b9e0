package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** WEIGHT-BALANCED shard assignment: distribute rows over `numShards`
    * shards so per-shard TOTAL WEIGHT (token counts, byte sizes) is
    * near-equal — what [[shardOf]]'s uniform hash does NOT give when row
    * weights are heavy-tailed (one shard catching a few giant documents
    * trains slower than the rest of the fleet; balanced shards are the
    * difference between stragglers and lockstep at 1000 trainers).
    *
    * Algorithm: boustrophedon ("snake") striping of the weight-descending
    * order — rank r (1-based) goes to shard `(r-1) % k` on odd stripes
    * and the reflection `k-1-((r-1) % k)` on even stripes, so consecutive
    * heavy rows land on DIFFERENT shards and each stripe of k rows adds
    * one row to every shard. Deterministic (ties on weight break by id),
    * no RNG.
    *
    * Scale: a single global rank would be one-task sequential, so ranking
    * runs WITHIN `numSlices` hash-slices of the id space (parallel
    * window; only (id, weight) pairs ride it, never payloads) and each
    * slice snakes independently. Every slice is internally balanced to
    * within its own max row weight, so the total imbalance is bounded by
    * `numSlices × max_weight` — independent of corpus size; `numSlices`
    * trades window parallelism against that bound. Slicing uses
    * `id % numSlices` for engine portability (swap a hash in when ids
    * are not uniform).
    *
    * @return `df` plus a `shard` column.
    */
  def balancedShards(df: DataFrame, idCol: String, weightCol: Column,
                     numShards: Int, numSlices: Int = 16): DataFrame = {
    require(numShards >= 1, s"numShards=$numShards must be >= 1")
    require(numSlices >= 1, s"numSlices=$numSlices must be >= 1")
    val slice = pmod(col(idCol), lit(numSlices))
    val w = Window.partitionBy(slice)
      .orderBy(weightCol.desc, col(idCol))
    val r = row_number().over(w) - 1 // 0-based rank within slice
    // floor(r/k) == integer division for non-negative r (exact in double
    // far beyond any per-slice row count)
    val stripe = floor(r.cast("double") / numShards).cast("long")
    val pos = pmod(r, lit(numShards))
    df.withColumn("shard",
      when(pmod(stripe, lit(2)) === 0, pos)
        .otherwise(lit(numShards - 1) - pos).cast("long"))
  }
}
