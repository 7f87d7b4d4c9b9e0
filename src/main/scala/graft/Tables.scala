package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared accessors for the driver's synthetic star schema
  * (/root/repo/TESTDATA.md). One parquet file per table.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
