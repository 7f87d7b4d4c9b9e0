package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Plan-shape helpers for window specifications. */
object WindowKeys {

  /** A constant-valued but NON-FOLDABLE window partition key ("" for every
    * row), anchored to `anchor`.
    *
    * Needed when a small, already-bounded row set (a top-k result, the k
    * seeds of an init step) must be ranked in a single partition: a bare
    * `lit(0)` partition key is stripped by `EliminateWindowPartitions`,
    * and `anchor * 0` simplifies to a literal when `anchor` is
    * non-nullable — both silently reintroduce the "No Partition Defined"
    * global window this key exists to avoid. `substring(cast, 0, 0)` is
    * data-dependent, so no current simplification rule folds it; if a
    * future Spark version learns to, every caller breaks in one place.
    */
  def constantPartitionKey(anchor: Column): Column =
    substring(anchor.cast("string"), 0, 0)
}
