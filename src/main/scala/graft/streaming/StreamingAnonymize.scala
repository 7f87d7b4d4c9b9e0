package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, ValueState}

/** Streaming k-ANONYMITY ADMISSION — the online form of
  * [[graft.operators.Anonymize]]: a row whose quasi-identifier group
  * has not yet reached `k` members is WITHHELD in state; the moment the
  * group's k-th member arrives, the whole held group flushes and every
  * later member passes straight through. Batch suppression asks "is
  * this group ≥ k in the final corpus"; a stream cannot know the final
  * corpus, so admission is the correct online semantics: a row is
  * emitted exactly when its group has proven k-strong, and a group that
  * never reaches quorum never leaks a row.
  *
  * This is a genuinely STATE-NATIVE operator (not a foreachBatch
  * batch-replay): the withheld rows ARE the state
  * (`transformWithState`, ListState per quasi key + a promotion flag),
  * and emission is exactly-once per row by construction — a row is
  * either in `held` or already emitted, never both.
  *
  * Eventual parity with batch (spec-pinned): after any prefix of the
  * stream, the emitted set == the batch [[graft.operators.Anonymize
  * .kAnonymize]] kept-set over that prefix RESTRICTED to groups that
  * reached k — i.e. exactly the batch answer, because batch keeps a
  * group iff its prefix count ≥ k.
  *
  * State bound: ≤ k−1 held rows per under-quorum group (promoted groups
  * hold ONE counter row); `ttl` evicts abandoned under-quorum groups —
  * their rows are then dropped, which is suppression, the safe
  * direction.
  */
object StreamingAnonymize {

  /** Input after quasi-key packing: `quasi` is the concatenated key,
    * `id` the caller's row id, `payload` an opaque rider. */
  case class QuasiRow(quasi: String, id: Long, payload: String)
  case class AdmittedRow(quasi: String, id: Long, payload: String)

  class KAnonAdmitProcessor(k: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, QuasiRow, AdmittedRow] {
    @transient private var held: ListState[QuasiRow] = _
    @transient private var promoted: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      held = getHandle.getListState[QuasiRow]("held",
        Encoders.product[QuasiRow], ttl)
      promoted = getHandle.getValueState[Boolean]("promoted",
        Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[QuasiRow],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AdmittedRow] = {
      val arrivals = rows.toVector.sortBy(_.id) // deterministic emit order
      if (promoted.exists()) {
        arrivals.iterator.map(r => AdmittedRow(r.quasi, r.id, r.payload))
      } else {
        // group population bounded by k-1 — safe to materialize
        val buffer = (scala.collection.mutable.ArrayBuffer
          .empty[QuasiRow] ++= held.get()) ++= arrivals
        if (buffer.length >= k) {
          promoted.update(true)
          held.clear()
          buffer.sortBy(_.id).iterator
            .map(r => AdmittedRow(r.quasi, r.id, r.payload))
        } else {
          arrivals.foreach(held.appendValue)
          Iterator.empty
        }
      }
    }
  }

  /** Admit a stream of rows under k-anonymity.
    *
    * @param rows streaming DataFrame; `quasiCols` are concatenated into
    *   the state key (U+0001-separated — a value containing the
    *   separator cannot alias another combination by accident only if
    *   the caller's values exclude it; pick another separator
    *   otherwise), `idCol` must be castable to long, `payloadCol` rides
    *   along opaquely (the caller re-joins wider rows by id)
    */
  def admit(rows: DataFrame, quasiCols: Seq[String], idCol: String,
            payloadCol: String, k: Long,
            ttl: TTLConfig = TTLConfig.NONE): Dataset[AdmittedRow] = {
    require(quasiCols.nonEmpty, "admit: no quasi columns")
    require(k >= 2, s"admit: k=$k must be >= 2")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(
        concat_ws("\u0001", quasiCols.map(c => col(c).cast("string")): _*)
          .as("quasi"),
        col(idCol).cast("long").as("id"),
        col(payloadCol).cast("string").as("payload"))
      .as[QuasiRow]
      .groupByKey(_.quasi)
      .transformWithState(new KAnonAdmitProcessor(k, ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None()
        else TimeMode.ProcessingTime(),
        OutputMode.Append(), Encoders.product[AdmittedRow])
  }
}
