package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared accessors for the driver's synthetic star schema
  * (/root/repo/TESTDATA.md). One parquet file per table.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — unsupported by Spark's
      // reader; read the raw INT64 nanos and truncate to micros (what
      // DuckDB's reader does too, so oracles agree).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
