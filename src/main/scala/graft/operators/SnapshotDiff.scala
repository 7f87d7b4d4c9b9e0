package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot delta: which keys were added, removed, or changed between two
  * versions of a keyed table — the audit/QA step between corpus releases
  * (what did this crawl refresh actually touch?) and the input a
  * downstream incremental consumer wants instead of a full re-read.
  *
  * Output is `(keys..., status)` with status ∈ added | removed | changed;
  * UNCHANGED rows are omitted, so the result scales with churn, not
  * corpus size. One full-outer hash join on the keys is the whole plan
  * (same scaling argument as [[Upsert]]); payload columns travel as one
  * struct each side and compare with ONE null-safe struct equality, so
  * wide tables add no per-column plan cost.
  */
object SnapshotDiff {

  def diff(before: DataFrame, after: DataFrame,
           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff requires at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: before ${before.columns.mkString(",")} vs " +
        s"after ${after.columns.mkString(",")}")
    val payload = before.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "diff requires at least one payload column")
    def pack(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+ struct(payload.map(col): _*).as(as): _*)
    pack(before, "_b").join(pack(after, "_a"), keys, "full_outer")
      .withColumn("status",
        when(col("_b").isNull, lit("added"))
          .when(col("_a").isNull, lit("removed"))
          .when(!(col("_b") <=> col("_a")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
  }
}
