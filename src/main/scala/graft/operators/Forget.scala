package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion propagation ("right to be forgotten"): remove a set of
  * document ids from the primary corpus AND every derived artifact
  * (chunk tables, embedding indexes, gram/dedup indexes, …), and emit a
  * verification MANIFEST as data — per artifact, how many rows existed,
  * were removed, and remain. Compliance wants the receipt, not just the
  * side effect; making the manifest a DataFrame keeps it queryable and
  * oracle-checkable like any other output.
  *
  * Scale design: the deletion list is broadcast (deletion batches are
  * small by nature); each artifact is scanned ONCE — a left join against
  * the broadcast list yields the removed-flag, from which the cleaned
  * rows (filter) and the manifest counts (aggregate) both derive. No
  * artifact shuffles; the manifest is a per-artifact 1-row aggregate
  * unioned across artifacts.
  */
object Forget {

  /** Internal deletion-side column names; artifacts must not use them
    * (they'd shadow the join/flag columns). */
  private val Reserved = Set("_forget_id", "_del")

  private def checkReserved(name: String, df: DataFrame): Unit = {
    val clash = df.columns.toSet.intersect(Reserved)
    require(clash.isEmpty,
      s"artifact '$name' uses reserved column name(s) ${clash.mkString(", ")}")
  }

  /** Clean one artifact: rows whose `idCol` is NOT in `deletions`. */
  def clean(artifact: DataFrame, idCol: String,
            deletions: DataFrame): DataFrame = {
    checkReserved("artifact", artifact)
    // artifacts commonly name their id column doc_id too — rename the
    // deletion side so the join condition can never be ambiguous, and
    // reference it through the dels frame (not an unqualified col) so
    // resolution can never drift to an artifact column
    val dels = deletions.select(col("doc_id").as("_forget_id"))
    artifact.join(broadcast(dels),
      artifact(idCol) === dels("_forget_id"), "left_anti")
  }

  /** Verification manifest over artifacts: one row per artifact with
    * `(artifact, n_before, n_removed, n_after)`.
    *
    * @param artifacts (name, df, idCol) triples; idCol joins against
    *   `deletions.doc_id`
    */
  def manifest(deletions: DataFrame,
               artifacts: Seq[(String, DataFrame, String)]): DataFrame = {
    require(artifacts.nonEmpty, "manifest needs at least one artifact")
    artifacts.foreach { case (name, df, _) => checkReserved(name, df) }
    val dels = deletions.select(col("doc_id").as("_forget_id")).distinct()
      .withColumn("_del", lit(1L))
    artifacts.map { case (name, df, idCol) =>
      df.join(broadcast(dels), df(idCol) === dels("_forget_id"), "left")
        .agg(count(lit(1)).as("n_before"),
          coalesce(sum(col("_del")), lit(0L)).as("n_removed"))
        .select(lit(name).as("artifact"), col("n_before"),
          col("n_removed"),
          (col("n_before") - col("n_removed")).as("n_after"))
    }.reduce(_ unionAll _)
  }
}
