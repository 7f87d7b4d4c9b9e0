package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert (merge) without a table format: updates win over target on
  * key collision, inserts append. The incremental-corpus-update primitive
  * (a Delta/Iceberg MERGE degenerates to this when the whole target is
  * rewritten). One anti-join shuffle on the key.
  */
object Merge {
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
}
