package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding merge training — the tokenizer-training
  * shape of an LLM data pipeline (learn the merge table FROM the corpus
  * that will be tokenized with it). The reference engine has no
  * tokenizer operator; this is part of the LLM-pipeline extension
  * surface alongside dedup/ANN/packing.
  *
  * Scale design: the corpus-sized work is ONE distributed word count
  * (the 100 TB pass — shuffle carries (word, count) pairs with map-side
  * partial aggregation). Training then iterates over the word-FREQUENCY
  * table (vocabulary-sized, millions of rows at web scale, never the
  * corpus): each merge round is a pair-count aggregation plus a map-only
  * merge application, with a `localCheckpoint` per round so lineage
  * stays O(1) across rounds (same discipline as KMeans/PageRank). The
  * only driver-side value per round is the argmax pair — a 1-row collect
  * that parameterizes the next round's expressions, mirroring
  * PageRank's convergence scalar.
  *
  * Determinism contract (what the DuckDB twin states): ties on pair
  * count break by pair string ascending; merge application is
  * left-to-right non-overlapping, expressed as a literal string replace
  * over a DOUBLE-SPACE-delimited symbol string — doubling the delimiter
  * gives each symbol its own boundary spaces, so adjacent matches share
  * no characters and sequential `replace` semantics (identical in Spark
  * and DuckDB) equal the greedy BPE scan. Words are the corpus token
  * convention ([[TextOps.tokens]]: lowercased `[a-z0-9]+` runs) with a
  * `</w>` end-of-word marker.
  */
object BpeTrain {

  /** Learn `k` merges. Returns `(rank, pair, merged, freq)` — one row
    * per merge in selection order; `freq` is the weighted pair count at
    * selection time. Stops early if no pair remains (fully merged).
    */
  def merges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = docs.sparkSession
    // THE corpus-scale pass: distributed word count. Everything after
    // operates on the vocabulary-sized frequency table.
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    var w = words
      .select(col("word"), col("freq"),
        concat(regexp_replace(col("word"), "(.)", "$1 "), lit("</w>"))
          .as("sym"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 0
    var done = false
    while (r < k && !done) {
      val arr = split(col("sym"), " ")
      // sequence(1, 0) infers a DESCENDING step — guard the single-symbol
      // (fully merged) word explicitly
      val pairs = w.select(col("freq"),
        explode(when(size(arr) >= 2,
          transform(sequence(lit(1), size(arr) - 1),
            i => concat(element_at(arr, i), lit(" "),
              element_at(arr, i + 1))))
          .otherwise(array().cast(ArrayType(StringType)))).as("p"))
      val best = pairs.groupBy(col("p"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        out += Row((r + 1).toLong, pair, merged, cnt)
        // apply left-to-right over doubled delimiters (see scaladoc)
        val spaced = concat(lit(" "),
          regexp_replace(col("sym"), " ", "  "), lit(" "))
        val applied = replace(spaced,
          lit(" " + pair.replace(" ", "  ") + " "),
          lit(" " + merged + " "))
        w = w.select(col("word"), col("freq"),
          trim(regexp_replace(applied, " +", " ")).as("sym"))
          .localCheckpoint(true)
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }

  /** The merge-application expression: fold the (k-row, driver-collected)
    * merge list over a word column as one codegen'd replace chain — the
    * same doubled-delimiter left-to-right semantics as training. */
  private def applyExpr(word: org.apache.spark.sql.Column,
                        ms: Seq[(String, String)]) = {
    val sym0 = concat(regexp_replace(word, "(.)", "$1 "), lit("</w>"))
    ms.foldLeft(sym0) { case (s, (pair, merged)) =>
      trim(regexp_replace(
        replace(concat(lit(" "), regexp_replace(s, " ", "  "), lit(" ")),
          lit(" " + pair.replace(" ", "  ") + " "),
          lit(" " + merged + " ")),
        " +", " "))
    }
  }

  /** Collect a merge table to the (pair, merged) list in rank order —
    * k rows by construction: the broadcast-a-dictionary pattern, not a
    * data collect. */
  def collectMerges(mergeTable: DataFrame): Seq[(String, String)] =
    mergeTable.orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("merged")))
      .toSeq

  /** Apply a learned merge table to every doc: `(doc_id, tokens)` with
    * the per-doc BPE token sequence in order — the serving-side shape
    * (training examples want sequences, not histograms). MAP-ONLY: the
    * merge fold runs in-row per word; no shuffle at all.
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
                  mergeTable: DataFrame): DataFrame = {
    val ms = collectMerges(mergeTable)
    docs.select(col(idCol).cast("long").as("doc_id"),
      flatten(transform(TextOps.tokens(col(textCol)),
        w => split(applyExpr(w, ms), " "))).as("tokens"))
  }

  /** Tokenize `docs` with a learned merge table: apply the merges in
    * rank order to each word and count the resulting corpus tokens per
    * symbol. Returns `(token, n)` — the post-BPE token histogram, the
    * "what did the tokenizer learn" readout. The corpus shuffles once
    * for the word count and once for the histogram aggregation.
    */
  def tokenize(docs: DataFrame, textCol: String,
               mergeTable: DataFrame): DataFrame = {
    val ms = collectMerges(mergeTable)
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    words.select(col("freq"),
        explode(split(applyExpr(col("word"), ms), " ")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("n"))
  }
}
