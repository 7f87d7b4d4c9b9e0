package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document BOILERPLATE removal over content-defined chunks — the
  * CCNet/RefinedWeb "repeated paragraph" stage of a pre-training corpus
  * pipeline: a text unit that recurs across many *distinct* documents
  * (headers, navigation, license blocks) is removed from every document,
  * while within-document repetition is left alone (that is
  * [[TextOps]]-repetition's job, a per-doc signal).
  *
  * The unit of repetition is the [[CdcChunk]] chunk, not a raw line: the
  * synthetic corpus (and plenty of real ones) has no newline structure,
  * and content-defined boundaries make the unit shift-resilient — a
  * boilerplate block reached via different prefixes still hashes to the
  * same chunks (the CDC re-sync property, spec'd in CdcChunkSpec).
  * Compared with [[SubstringDedup]] (character-window exact-substring
  * marking), this operator is coarser-grained but an order cheaper: no
  * L× window explode — the chunk pass is map-only and the corpus text
  * never rides a shuffle wider than 1×.
  *
  * Scale design:
  *   1. chunk pass: map-only ([[CdcChunk.chunks]]); staged once
  *      (`localCheckpoint`) because both the frequency count and the
  *      rebuild consume it — the 100 TB analog is the materialized
  *      chunk table a real pipeline keeps anyway (d_chunk_dedup reads
  *      the same artifact).
  *   2. frequency count: ONE `groupBy(chunk_md5)` — 32-hex digests plus
  *      a doc id on the shuffle, never chunk text.
  *   3. mark: left join chunk sites against the (small, skew-free)
  *      frequent-digest table; Spark broadcasts it while it fits and
  *      falls back to a hash join when a pathological corpus makes the
  *      boilerplate table itself large.
  *   4. rebuild: per-doc `collect_list` of kept chunk positions (ints
  *      only) + ONE doc_id join back to the corpus text; the token
  *      slices are re-joined in chunk order with an in-row higher-order
  *      expression — no UDF, no second text shuffle.
  *
  * Contract: output has EXACTLY one row per input doc (`doc_id`,
  * `n_chunks`, `n_kept`, `text`); a fully-boilerplate doc keeps an empty
  * string, not a missing row (the [[SubstringDedup.strip]] convention —
  * a vanished row would silently corrupt downstream token accounting).
  * The rebuilt text is the kept chunks' TOKEN stream re-joined with
  * single spaces — the chunk table's native alphabet ([[TextOps.tokens]]
  * lower-cases and drops punctuation, so original casing/spacing is not
  * preserved; on the normalized corpora this stage runs after, the two
  * coincide).
  */
object Boilerplate {

  /** Digests occurring in at least `minDocs` DISTINCT docs:
    * `(chunk_md5, n_docs)`. Distinct-doc counting (not occurrence
    * counting) is the cross-doc semantics — a chunk repeated a thousand
    * times inside one document is not boilerplate. */
  def frequentChunks(chunks: DataFrame, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs must be >= 2")
    chunks.groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Remove every chunk whose digest occurs in ≥ `minDocs` distinct docs
    * and rebuild each document from its kept chunks, in order. */
  def strip(docs: DataFrame, idCol: String, textCol: String,
            w: Int = 4, modulus: Int = 8, minDocs: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    // consumed by BOTH the frequency count and the rebuild join — stage
    // once (eager: lazy checkpoints re-run the subtree per consumer)
    val ch = CdcChunk.chunks(base, "doc_id", "text", w, modulus)
      .localCheckpoint(true)
    val boiler = frequentChunks(ch, minDocs).select(col("chunk_md5"))
      .withColumn("_boiler", lit(true))
    val kept = ch.join(boiler, Seq("chunk_md5"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("_boiler").isNull, 1)).as("n_kept"),
        // collect_list drops the nulls the `when` leaves for boilerplate
        // rows; struct order (chunk_id first) makes sort_array restore
        // document order
        sort_array(collect_list(when(col("_boiler").isNull,
          struct(col("chunk_id"),
            col("start_tok").cast("int").as("s"),
            col("n_toks").cast("int").as("n"))))).as("keep"))
    // every doc emits ≥ 1 chunk (CdcChunk contract), so the inner join
    // preserves the one-row-per-doc invariant
    base.join(kept, Seq("doc_id"))
      .withColumn("_toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        array_join(
          flatten(transform(col("keep"),
            c => slice(col("_toks"), c.getField("s"), c.getField("n")))),
          " ").as("text"))
  }
}
