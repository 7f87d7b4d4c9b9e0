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
      // events.ts encoding varies across testdata generations:
      //  - TIMESTAMP(NANOS): unsupported by Spark's reader — read the raw
      //    INT64 nanos (legacy flag) and truncate to micros (what DuckDB's
      //    reader does too, so oracles agree);
      //  - timestamp[us] (no tz): Spark reads TIMESTAMP_NTZ — cast to the
      //    session-tz TIMESTAMP (session tz is pinned UTC everywhere, so
      //    wall-clock == instant and epoch math matches DuckDB's epoch()).
      // Branch on the loaded dtype so either generation works unchanged.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
