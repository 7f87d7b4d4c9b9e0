package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-domain providers under graft.queries; every key
  * with a DuckDB-expressible semantics also appears in `oracleSql` (column
  * names aligned — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Denormalize + aggregate — the same join→agg shape as the reference's
    * denormalize_and_link (lib/personalgreenbutton/src/lib.rs:32-190).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_two_hop")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.OperatorQueries.queries ++
      graft.queries.TrainingDataQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.Round4Queries.queries ++
      graft.queries.Round5Queries.queries ++
      graft.queries.Round6Queries.queries ++
      graft.queries.Round7Queries.queries ++
      graft.queries.Round8Queries.queries ++
      graft.queries.Round9Queries.queries ++
      graft.queries.Round10Queries.queries ++
      graft.queries.Round11Queries.queries ++
      graft.queries.Round12Queries.queries ++
      graft.queries.Round13Queries.queries ++
      graft.queries.Round14Queries.queries ++
      graft.queries.Round15Queries.queries ++
      graft.queries.Round16Queries.queries ++
      graft.queries.Round17Queries.queries ++
      graft.queries.Round18Queries.queries ++
      graft.queries.Round19Queries.queries ++
      graft.queries.Round20Queries.queries ++
      graft.queries.Round21Queries.queries ++
      graft.queries.Round22Queries.queries ++
      graft.queries.Round23Queries.queries ++
      graft.queries.Round24Queries.queries ++
      graft.queries.Round25Queries.queries ++
      graft.queries.Round26Queries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.OperatorQueries.oracleSql ++
      graft.queries.TrainingDataQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.ExtendedQueries.oracleSql ++
      graft.queries.Round4Queries.oracleSql ++
      graft.queries.Round5Queries.oracleSql ++
      graft.queries.Round6Queries.oracleSql ++
      graft.queries.Round7Queries.oracleSql ++
      graft.queries.Round8Queries.oracleSql ++
      graft.queries.Round9Queries.oracleSql ++
      graft.queries.Round10Queries.oracleSql ++
      graft.queries.Round11Queries.oracleSql ++
      graft.queries.Round12Queries.oracleSql ++
      graft.queries.Round13Queries.oracleSql ++
      graft.queries.Round14Queries.oracleSql ++
      graft.queries.Round15Queries.oracleSql ++
      graft.queries.Round16Queries.oracleSql ++
      graft.queries.Round17Queries.oracleSql ++
      graft.queries.Round18Queries.oracleSql ++
      graft.queries.Round19Queries.oracleSql ++
      graft.queries.Round20Queries.oracleSql ++
      graft.queries.Round21Queries.oracleSql ++
      graft.queries.Round22Queries.oracleSql ++
      graft.queries.Round23Queries.oracleSql ++
      graft.queries.Round24Queries.oracleSql ++
      graft.queries.Round25Queries.oracleSql ++
      graft.queries.Round26Queries.oracleSql
}
