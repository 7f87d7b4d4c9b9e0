package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics over plain DataFrames (no table format required):
  * the CDC / slowly-changing-dimension apply step of an incremental
  * corpus pipeline — fold a batch of changed rows into a base snapshot.
  *
  *   - matched key + `deleteCond` (over the SOURCE row's values) → row
  *     dropped
  *   - matched key otherwise → full-row UPDATE (source wins)
  *   - source-only key → INSERT
  *   - target-only key → unchanged
  *
  * Relationship to [[Merge.upsert]]: that is the lightweight
  * update-or-insert primitive (anti-join + union, no delete, no audit);
  * this operator is the full MERGE statement — WHEN MATCHED [AND cond]
  * DELETE / UPDATE, WHEN NOT MATCHED INSERT — in ONE full-outer pass.
  *
  * One full-outer hash join on the key columns is the whole plan — the
  * minimum any merge must pay. At scale, both sides hash-partition on the
  * same keys (bucketed/pre-partitioned storage makes it shuffle-free),
  * and the non-key payloads travel as single structs so wide tables add
  * no per-column join cost. Deterministic: output depends only on input
  * rows, never on arrival order — `source` must be key-unique (enforced
  * upstream or via a last-writer-wins pre-aggregate; duplicate source
  * keys would make "source wins" ambiguous).
  */
object Upsert {

  /** As [[mergeTagged]] without the audit column. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            deleteCond: Option[Column] = None): DataFrame =
    mergeTagged(target, source, keys, deleteCond).drop("from_source")

  /** Merged snapshot plus a `from_source` boolean marking rows whose
    * values came from the source batch (update or insert) — the audit
    * column a CDC apply usually wants. */
  def mergeTagged(target: DataFrame, source: DataFrame, keys: Seq[String],
                  deleteCond: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"schema mismatch: target ${target.columns.mkString(",")} vs " +
        s"source ${source.columns.mkString(",")}")
    val payload = target.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        struct(payload.map(col): _*).as(as): _*)
    val joined = pack(target, "_t")
      .join(pack(source, "_s"), keys, "full_outer")
      .select((keys.map(col) :+
        when(col("_s").isNotNull, col("_s")).otherwise(col("_t")).as("_r") :+
        (col("_s").isNotNull && col("_t").isNotNull).as("_matched") :+
        col("_s").isNotNull.as("from_source")): _*)
    val unpacked = joined.select(
      (keys.map(col) ++ payload.map(c => col(s"_r.$c").as(c)) :+
        col("_matched") :+ col("from_source")): _*)
    val afterDelete = deleteCond match {
      case Some(cond) => unpacked.filter(!(col("_matched") && cond))
      case None       => unpacked
    }
    afterDelete.drop("_matched")
  }
}
