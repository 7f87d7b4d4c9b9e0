package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.text.Retrieval

/** Streaming BM25 serving: top-k docs for a STREAM of term-set queries
  * against a static persisted postings index
  * ([[graft.similarity.TrainedState.saveRetrievalIndex]]) — the online
  * half of the retrieval lifecycle. Same `foreachBatch` rationale as
  * [[StreamingAnn]]: each micro-batch of queries is small by nature
  * while the index side is the 100 TB one, and one code path with the
  * batch [[Retrieval.topK]] carries the oracle-checked scoring
  * arithmetic to the stream verbatim.
  */
object StreamingRetrieval {

  /** Serve top-k BM25 docs per streamed query.
    *
    * @param queries streaming DataFrame with (`query_id` LONG,
    *   `terms` ARRAY&lt;STRING&gt;)
    * @param sink receives (top-k DataFrame, batchId) per micro-batch
    */
  def serveTopK(queries: DataFrame, postings: DataFrame,
                terms: DataFrame, docLens: DataFrame, stats: DataFrame,
                k: Int, availableNow: Boolean = false)
               (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = queries.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Retrieval.topK(batch.toDF(), postings, terms, docLens,
          stats, k), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** [[serveTopK]] from the artifact path alone: per-trigger
    * fingerprint-cached loads, so fold-ins and deletions landed by
    * concurrent loops serve at the NEXT trigger with no restart (the
    * [[StreamingAnn.serveGraphFromArtifacts]] contract). */
  def serveTopKFromArtifacts(queries: DataFrame,
                             spark: org.apache.spark.sql.SparkSession,
                             path: String, k: Int,
                             availableNow: Boolean = false)
                            (sink: (DataFrame, Long) => Unit)
      : StreamingQuery = {
    val writer = queries.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val (postings, terms, docLens, stats) = graft.similarity
          .TrainedState.loadRetrievalIndexCached(spark, path)
        sink(Retrieval.topK(batch.toDF(), postings, terms, docLens,
          stats, k), batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** The PERSISTED FOLD-IN loop for a BM25 deployment — the
    * [[StreamingAnn.buildGraphPersisted]] discipline on the inverted
    * index: per micro-batch of documents `(doc_id, text)`,
    * [[Retrieval.buildIndex]] over JUST the batch feeds
    * [[graft.similarity.TrainedState.foldInRetrieval]] (postings and
    * docLens delta generations, accumulated term dfs for the touched
    * vocabulary slice, exact stats merge — O(batch + touched terms)
    * per trigger, and ADDITION IS EXACT: the folded index serves
    * bit-identically to a rebuild). Redelivery REJECTS loudly — a
    * live doc cannot be replaced in-stream; forget it first
    * ([[forgetRetrievalPersisted]] tombstones the doc and the guard,
    * which reads the tombstone-aware docLens load id-pruned, then
    * admits the re-ingest). Every delta-bearing sub-artifact compacts
    * by the `maxGenerations` policy. */
  def buildRetrievalPersisted(newDocs: DataFrame, path: String,
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              maxGenerations: Long = graft.similarity
                                .TrainedState.DefaultMaxGenerations,
                              availableNow: Boolean = false)
                             (sink: (DataFrame, Long) => Unit =
                               (_, _) => ()): StreamingQuery = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val TS = graft.similarity.TrainedState
    val writer = newDocs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (rawBatch: Dataset[Row], batchId: Long) =>
        val spark = rawBatch.sparkSession
        val batch = rawBatch.toDF()
          .select(col(idCol).cast("long").as("doc_id"),
            col(textCol).cast("string").as("text"))
          .localCheckpoint(true)
        if (!batch.isEmpty) {
          val dup = batch.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n")).filter(col("n") > 1)
            .limit(5).collect()
          require(dup.isEmpty,
            "buildRetrievalPersisted: duplicate doc_id(s) within one " +
              "micro-batch: " + dup.map(_.getLong(0)).mkString(", "))
          // id-pruned redelivery probe against the doc_id-sorted
          // tombstone-aware docLens load — never a corpus scan
          val ids = batch.select(col("doc_id")).collect()
            .map(_.getLong(0)).toIndexedSeq
          val live = TS.loadRetrievalIndexCached(spark, path)._3
          val redelivered =
            (if (ids.length <= (1 << 12))
               live.filter(col("doc_id").isin(ids: _*))
             else live.join(broadcast(batch.select(col("doc_id"))),
               Seq("doc_id"), "left_semi"))
              .select(col("doc_id")).limit(5).collect()
              .map(_.getLong(0))
          require(redelivered.isEmpty,
            "buildRetrievalPersisted: redelivered doc_id(s) " +
              redelivered.mkString(", ") +
              " — a live doc cannot be replaced in-stream; forget it " +
              "first (forgetRetrievalPersisted tombstones the doc and " +
              "this guard then admits the re-ingest)")
          val (posts, _, lens, _) =
            Retrieval.buildIndex(batch, "doc_id", "text")
          TS.foldInRetrieval(spark, posts, lens, path)
          sink(lens, batchId)
          TS.compactIfNeeded(spark, s"$path/postings", maxGenerations)(
            TS.compactRetrievalPostings)
          TS.compactIfNeeded(spark, s"$path/terms", maxGenerations)(
            TS.compactRetrievalTerms)
          TS.compactIfNeeded(spark, s"$path/doclens", maxGenerations)(
            TS.compactRetrievalDocLens)
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** The LAZY-DELETE loop for a BM25 deployment: per micro-batch of
    * `doc_id`s, ONE O(deletions) tombstone generation on docLens —
    * the membership side of serving, so the docs leave the results
    * IMMEDIATELY — while postings rows and df/n/avgdl stay stale (the
    * documented score-drift trade;
    * [[graft.similarity.TrainedState.consolidateRetrievalIndex]] on a
    * maintenance cadence recomputes them exactly). Receipts are LAZY:
    * `(doc_id, dl, was_indexed)` per requested id from the pre-delete
    * docLens load. */
  def forgetRetrievalPersisted(deleteDocIds: DataFrame, path: String,
                               maxGenerations: Long = graft.similarity
                                 .TrainedState.DefaultMaxGenerations,
                               availableNow: Boolean = false)
                              (sink: (DataFrame, Long) => Unit =
                                (_, _) => ()): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val TS = graft.similarity.TrainedState
    val writer = deleteDocIds.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (rawBatch: Dataset[Row], batchId: Long) =>
        val spark = rawBatch.sparkSession
        val batch = rawBatch.toDF().select(col("doc_id").cast("long")
          .as("doc_id")).localCheckpoint(true)
        if (!batch.isEmpty) {
          val receipts = batch
            .join(TS.loadRetrievalIndexCached(spark, path)._3,
              Seq("doc_id"), "left")
            .select(col("doc_id"), col("dl"),
              col("dl").isNotNull.as("was_indexed"))
          TS.forgetRetrievalDocs(batch, path)
          sink(receipts, batchId)
          TS.compactIfNeeded(spark, s"$path/doclens", maxGenerations)(
            TS.compactRetrievalDocLens)
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
