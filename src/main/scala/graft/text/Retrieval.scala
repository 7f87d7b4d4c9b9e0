package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index BM25 retrieval with a build-once / serve-many split —
  * the query-driven curation primitive (find the corpus docs most
  * relevant to a probe query: eval-adjacent data, topical slices,
  * targeted inspection). `d_bm25` scores ONE fixed query inline; this
  * is the general form: a persisted postings index serving arbitrary
  * multi-query batches, batch or streaming.
  *
  * Scoring arithmetic is the repo's BM25 convention verbatim
  * (k1 = 1.2, b = 0.75, Lucene-style idf; each (doc, term)
  * contribution a sum-free chain of deterministic double ops
  * INTEGERIZED at 1e9 before the per-doc sum — the integerize-then-sum
  * convention, so scores, ordering, and the top-k cut are engine-exact).
  *
  * Scale design: the index artifacts are `postings(term, doc_id, tf)`
  * (corpus-term-sized — partition/bucket by term on persist so a query
  * touches only its terms' postings), `terms(term, df)` and
  * `docLens(doc_id, dl)` (vocabulary-/corpus-sized), `stats(n, avgdl)`
  * (1 row). Serving joins the BROADCAST query-term set (with df
  * attached) into postings — the corpus-sized side never shuffles for
  * the probe; the per-(query, doc) sum and top-k rank shuffle only the
  * matched postings.
  */
object Retrieval {

  /** Build the index artifacts:
    * `(postings(term, doc_id, tf), terms(term, df), docLens(doc_id,
    * dl), stats(n, avgdl))`. Empty docs are excluded (they can match
    * nothing and would poison avgdl). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val docLens = base.filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = docLens.agg(count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl"))
    val postings = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    // postings is distinct per (term, doc) by construction — plain count
    val terms = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    (postings, terms, docLens, stats)
  }

  /** The query-term localization cap: a probe batch above this many
    * DISTINCT terms falls back to the join-only plan (the
    * joinProbedCells discipline — literal pruning only when the list
    * is bounded enough to inline). */
  private val MaxLocalQueryTerms = 1 << 12

  /** Top-k BM25 docs per query. `queries` = `(query_id LONG, terms
    * ARRAY<STRING>)`; repeated query terms count once (the d_bm25
    * distinct-term convention). Queries with no matching postings emit
    * no rows (the recall-zero convention).
    *
    * Scale shape: the query batch is bounded by contract, so its
    * DISTINCT term set localizes and pushes into the postings AND
    * terms scans as a literal `isin` — compile-time row-group pruning
    * against the term-sorted [[graft.similarity.TrainedState
    * .saveRetrievalIndex]] layout, so a probe batch reads only its
    * terms' row groups instead of the whole postings table (the
    * static-cell-prune discipline from the IVF probe applied to the
    * inverted index; the inner joins make the filter semantically
    * free). Past [[MaxLocalQueryTerms]] the plan falls back to the
    * unpruned broadcast join. */
  def topK(queries: DataFrame, postings: DataFrame, terms: DataFrame,
           docLens: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val qtRaw = queries
      .select(col("query_id").cast("long").as("query_id"),
        explode(col("terms")).as("term"))
      .distinct()
    val termList = qtRaw.select(col("term")).distinct()
      .limit(MaxLocalQueryTerms + 1).collect().map(_.getString(0))
    val (postingsIn, termsIn) =
      if (termList.length <= MaxLocalQueryTerms && termList.nonEmpty)
        (postings.filter(col("term").isin(termList.toIndexedSeq: _*)),
          terms.filter(col("term").isin(termList.toIndexedSeq: _*)))
      else (postings, terms)
    val qt = qtRaw
      // df attaches on the SMALL side before the postings probe — one
      // broadcast of (query_id, term, df) is all the corpus-sized join
      // ever sees
      .join(termsIn, Seq("term"))
    val scored = postingsIn.join(broadcast(qt), Seq("term"))
      .join(docLens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("term_e9", round(
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * 2.2 /
          (col("tf") + lit(1.2) *
            (lit(0.25) + col("dl") * 0.75 / col("avgdl"))) * 1e9)
        .cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_e9")).as("bm25_e9"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_e9").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("bm25_e9"))
  }
}
