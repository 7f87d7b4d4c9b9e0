package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (Rabin-style boundaries over token windows)
  * — the shift-resilient alternative to fixed-size chunking for
  * chunk-level dedup: a one-token insertion moves every fixed-size
  * chunk boundary after it, but content-defined boundaries RE-SYNC
  * (they depend only on a local window), so all downstream chunks keep
  * their hashes and dedup/delta-encode against the old version. The
  * standard trick of CDC storage systems (LBFS/restic shape), applied
  * to training-corpus chunk tables.
  *
  * Contract: a boundary falls AFTER token j (1-based, w ≤ j ≤ L-1) when
  * the 16-bit md5 prefix of the w-token gram ENDING at j is ≡ 0 mod
  * `modulus` — the engine-portable md5 convention (no engine-specific
  * hash), so the DuckDB oracle replays boundaries exactly. Expected
  * chunk length ≈ `modulus` tokens. Every doc emits ≥ 1 chunk (an empty
  * doc emits one empty chunk — the every-doc-keeps-a-row convention).
  *
  * Scale design: entirely MAP-ONLY — boundaries, cuts, and chunk slices
  * are higher-order array expressions in-row; no shuffle, no UDF, no
  * state. Cost is O(L) grams of w tokens per doc. The chunk table
  * shuffles only where downstream operators ask it to (e.g. a groupBy
  * on chunk_md5 for cross-doc chunk dedup — one hash shuffle of 32-hex
  * digests, never chunk text).
  */
object CdcChunk {

  /** `(doc_id, chunk_id, start_tok, n_toks, chunk_md5)` — one row per
    * chunk, chunk_id 1-based in token order, start_tok the 1-based
    * token index. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             w: Int = 4, modulus: Int = 8): DataFrame = {
    require(w >= 1 && modulus >= 1)
    val t = TextOps.tokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"), t.as("t"))
      // boundary positions: gram ending at j ≡ 0 (mod modulus), via the
      // native CdcBoundaries kernel — the declarative HOF form
      // (filter(sequence, j -> hash16(concat_ws(slice)))) paid
      // interpreted per-gram Column evaluation (HOFs never codegen;
      // the WinnowKeys lesson). Short docs (< w+1 tokens) have no
      // interior gram end → empty, same as the old guard.
      .withColumn("bp",
        graft.functions.CdcBoundaries.cdcBoundaries(col("t"), w, modulus))
      .withColumn("cuts",
        concat(array(lit(0)), col("bp"), array(size(col("t")))))
      .select(col("doc_id"), col("t"), col("cuts"),
        posexplode(transform(sequence(lit(1), size(col("cuts")) - 1),
          i => struct(
            (element_at(col("cuts"), i) + 1).as("start"),
            element_at(col("cuts"), i + 1).as("stop"))))
          .as(Seq("ci", "c")))
      .select(col("doc_id"),
        (col("ci") + 1).cast("long").as("chunk_id"),
        col("c.start").cast("long").as("start_tok"),
        (col("c.stop") - col("c.start") + 1).cast("long").as("n_toks"),
        md5(array_join(
          slice(col("t"), col("c.start"),
            col("c.stop") - col("c.start") + 1), " ").cast("binary"))
          .as("chunk_md5"))
  }
}
