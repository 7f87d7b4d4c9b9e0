package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{coalesce, col, concat, lit, raise_error, when}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.Decontaminate

/** STREAMING benchmark decontamination — the continuous-crawl admission
  * gate: documents arrive in micro-batches and each batch is flagged
  * against a STATIC eval set before it may enter the training corpus.
  * One code path with the batch operator ([[Decontaminate.flagWith]] per
  * trigger — the [[StreamingIngest]] convention, so the oracled
  * d_decontaminate contract carries over verbatim), and the eval side's
  * distinct gram table is staged ONCE at stream start: the eval corpus
  * is never re-scanned or re-shingled per trigger, only the bounded
  * batch is (the [[graft.similarity.IncrementalDedup]] cost rule —
  * per-arrival work must not grow with the static side).
  *
  * Admission is STATELESS (a doc's contamination depends only on its own
  * text and the fixed eval set), so redelivery is idempotent by
  * construction and there is no fold-in/replacement question.
  */
object StreamingDecontaminate {

  /** Flag each streamed micro-batch of documents against the eval set.
    * The sink receives the per-doc decision report joined back to the
    * batch rows — `(doc_id, text, n_hits, contaminated)` — so a caller
    * writes admitted docs (`!contaminated`) and quarantines the rest
    * with their evidence counts in one pass.
    *
    * @param docs streaming `(doc_id, text, …)` batch source
    * @param eval static eval-set table with `textCol`
    * @param n    shingle width (word n-grams, 8 = the benchmark default)
    */
  def admit(docs: DataFrame, eval: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", n: Int = 8,
            availableNow: Boolean = false)
           (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // corpus-invariant side staged once — never rebuilt per trigger
    val evalGrams = Decontaminate
      .evalGramTable(eval, textCol, n).localCheckpoint(true)
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (rawBatch: Dataset[Row], batchId: Long) =>
        val batch = rawBatch.toDF()
        val flags = Decontaminate.flagWith(batch, evalGrams, idCol,
          textCol, n)
        // the decision join is keyed on cast(id AS long); an id that
        // casts to null would vanish from BOTH sides — neither admitted
        // nor quarantined, breaking the every-row-yields-a-decision
        // contract. Fail loudly instead (raise_error IN the value
        // expression — a standalone assert_true column is dead-column-
        // pruned and never fires, the poolSum lesson).
        val docId = when(col(idCol).cast("long").isNotNull,
            col(idCol).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"StreamingDecontaminate.admit: $idCol value '"),
            coalesce(col(idCol).cast("string"), lit("NULL")),
            lit("' does not cast to BIGINT — every batch row must " +
              "yield exactly one decision row"))).cast("long"))
        // MATERIALIZED before the join (eager localCheckpoint): the
        // inner join infers IsNotNull(doc_id) and would push that
        // filter below this projection — dropping the null-key row
        // BEFORE the raise_error branch ever evaluates (observed: the
        // guard never fired and the row silently vanished anyway).
        // Forcing the guarded projection standalone leaves the
        // optimizer nothing to bypass; the batch side is trigger-sized.
        val keyed = batch.select(docId.as("doc_id"),
          col(textCol).as(textCol)).localCheckpoint(true)
        sink(keyed.join(flags, Seq("doc_id")), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
