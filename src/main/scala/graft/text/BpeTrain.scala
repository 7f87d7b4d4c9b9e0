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

  /** Vocab-row threshold below which training runs driver-local. A
    * 4M-word vocabulary at ~30 bytes/row is ~120 MB on the driver —
    * comfortably within any production driver heap, and far above real
    * natural-language vocabularies (web-scale English ~10-20M raw words
    * only when unfiltered). Above it the distributed per-round loop
    * keeps correctness at any scale. Same adaptive split as
    * [[graft.similarity.DedupClusters.connectedComponents]].
    */
  val LocalVocabMax: Long = 4L * 1000 * 1000

  /** The corpus-scale pass shared by both engines: distributed word
    * count with map-side partial aggregation. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `k` merges. Returns `(rank, pair, merged, freq)` — one row
    * per merge in selection order; `freq` is the weighted pair count at
    * selection time. Stops early if no pair remains (fully merged).
    *
    * ADAPTIVE: the corpus pays exactly one distributed word count;
    * training then runs on the vocabulary-sized frequency table. Below
    * [[LocalVocabMax]] rows that table is collected and trained with the
    * classic heap-based incremental-pair-count loop — O(1) Spark jobs
    * total instead of one `groupBy`+`limit(1).collect()` job PER MERGE
    * (at a production vocab of 32k merges the per-round job overhead
    * alone is hours). Above the threshold the distributed loop runs
    * unchanged. Both engines implement the identical determinism
    * contract (occurrence-weighted pair counts, ties by pair string
    * ascending, greedy left-to-right merge application), spec-proven
    * equal on shared vectors.
    */
  def merges(docs: DataFrame, textCol: String, k: Int,
             localVocabMax: Long = LocalVocabMax): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // Materialize the one corpus pass so the row count and the
    // subsequent train (collect or distributed loop) don't re-scan.
    val words = wordFreq(docs, textCol).localCheckpoint(true)
    if (words.count() <= localVocabMax) mergesLocalFromWords(words, k)
    else mergesDistributedFromWords(words, k)
  }

  /** Forced-distributed variant (the over-threshold engine), exposed for
    * the local==distributed parity spec. */
  def mergesDistributed(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    mergesDistributedFromWords(wordFreq(docs, textCol), k)
  }

  private def mergesDistributedFromWords(words: DataFrame, k: Int): DataFrame = {
    val spark = words.sparkSession
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
    toMergeDf(spark, out.toSeq)
  }

  private def toMergeDf(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))

  /** Forced-local variant (the under-threshold engine), exposed for the
    * parity spec. */
  def mergesLocal(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    mergesLocalFromWords(wordFreq(docs, textCol), k)
  }

  private def mergesLocalFromWords(words: DataFrame, k: Int): DataFrame = {
    val spark = words.sparkSession
    val wf = words.collect().map(r =>
      (r.getAs[String]("word"), r.getAs[Long]("freq")))
    toMergeDf(spark, trainLocal(wf, k))
  }

  /** Classic heap-based BPE trainer over a collected (word, freq) table.
    * Pair counts update INCREMENTALLY (only words containing the chosen
    * pair are touched per round) and the argmax comes from a lazy-
    * deletion max-heap — so per-round cost is proportional to the
    * affected words, not the vocabulary, and zero Spark jobs run.
    *
    * Semantics are bit-identical to the distributed loop: pair counts
    * are occurrence-weighted (a word `aaa` = symbols `a a a </w>`
    * contributes freq twice to pair `a a`), ties break by the
    * space-joined pair string ascending (symbols are ASCII by the token
    * contract, so Java and UTF8-binary string order agree), and merge
    * application is the greedy left-to-right non-overlapping scan —
    * exactly what the doubled-delimiter `replace` computes.
    */
  private[text] def trainLocal(wordFreqs: Array[(String, Long)],
                               k: Int): Seq[Row] = {
    import scala.collection.mutable
    final class W(var syms: Array[String], val freq: Long)
    val ws = wordFreqs.map { case (w, f) =>
      new W(w.map(_.toString).toArray :+ "</w>", f)
    }
    def pairStr(a: String, b: String) = a + " " + b
    val counts = mutable.HashMap.empty[String, Long]
    // pair -> indices of words that contained it at some point (grow-only;
    // staleness is fine — application re-checks adjacency)
    val where = mutable.HashMap.empty[String, mutable.ArrayBuffer[Int]]
    // max-heap with lazy deletion: (count, pair) ordered count desc then
    // pair asc; entries are stale unless count == counts(pair)
    val heap = mutable.PriorityQueue.empty[(Long, String)](
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
    def bump(p: String, delta: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + delta
      if (c <= 0L) counts.remove(p) else { counts(p) = c; heap.enqueue((c, p)) }
    }
    ws.zipWithIndex.foreach { case (w, i) =>
      var j = 0
      while (j < w.syms.length - 1) {
        val p = pairStr(w.syms(j), w.syms(j + 1))
        bump(p, w.freq)
        where.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += i
        j += 1
      }
    }
    def applyPair(syms: Array[String], a: String, b: String,
                  merged: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += merged; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }
    val out = mutable.ArrayBuffer.empty[Row]
    var r = 0
    var done = false
    while (r < k && !done) {
      // pop to the first live entry
      var best: Option[(Long, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (c, p) = heap.dequeue()
        if (counts.getOrElse(p, 0L) == c) best = Some((c, p))
      }
      best match {
        case None => done = true
        case Some((cnt, pair)) =>
          val Array(a, b) = pair.split(" ", 2)
          val merged = a + b
          out += Row((r + 1).toLong, pair, merged, cnt)
          val touched = where.getOrElse(pair, mutable.ArrayBuffer.empty[Int])
          touched.distinct.foreach { i =>
            val w = ws(i)
            var has = false
            var j = 0
            while (!has && j < w.syms.length - 1) {
              has = w.syms(j) == a && w.syms(j + 1) == b; j += 1
            }
            if (has) {
              var j2 = 0
              while (j2 < w.syms.length - 1) {
                bump(pairStr(w.syms(j2), w.syms(j2 + 1)), -w.freq); j2 += 1
              }
              w.syms = applyPair(w.syms, a, b, merged)
              j2 = 0
              while (j2 < w.syms.length - 1) {
                val p2 = pairStr(w.syms(j2), w.syms(j2 + 1))
                bump(p2, w.freq)
                where.getOrElseUpdate(p2,
                  mutable.ArrayBuffer.empty[Int]) += i
                j2 += 1
              }
            }
          }
          where.remove(pair)
          r += 1
      }
    }
    out.toSeq
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

  /** Tokenizer FERTILITY by group (post-BPE tokens per word — the
    * standard tokenizer-evaluation readout, per language): `(group,
    * n_words, n_tokens, fert_x1000)` with fert_x1000 = tokens·1000 div
    * words. Scale: one corpus shuffle for the (group, word) count; the
    * merge fold runs once per DISTINCT word (vocabulary-sized, the
    * [[tokenize]] contract), re-attached by a vocabulary-sized equi
    * join; per-group sums map-side combine. The (group, word) table is
    * staged — it feeds both the distinct-word cost pass and the join.
    */
  def fertility(docs: DataFrame, groupCol: String, textCol: String,
                mergeTable: DataFrame): DataFrame = {
    val ms = collectMerges(mergeTable)
    val lw = docs.select(col(groupCol).as("grp"),
        explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val wcost = lw.select(col("word")).distinct()
      .select(col("word"),
        size(split(applyExpr(col("word"), ms), " ")).cast("long")
          .as("n_syms"))
    lw.join(wcost, Seq("word"))
      .groupBy(col("grp"))
      .agg(sum(col("freq")).as("n_words"),
        sum(col("freq") * col("n_syms")).as("n_tokens"))
      .select(col("grp").as(groupCol), col("n_words"), col("n_tokens"),
        expr("(n_tokens * 1000) div n_words").as("fert_x1000"))
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
