package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF corpus scoring: the standard two-pass shape — one shuffle to
  * build the document-frequency dimension (small: vocabulary-sized), then a
  * broadcast join back to the exploded term stream. Term order inside a
  * document never matters, so everything partial-aggregates map-side.
  */
object TfIdf {

  /** (doc_id, term, tf) — term frequency per document. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (term, df, idf) with idf = ln((N+1)/(df+1)) + 1 (smoothed). Total for
    * ANY (doc_id, term) frame (countDistinct); [[topTerms]] uses the
    * cheaper plain count inline because [[termFreq]] output is distinct
    * per (doc_id, term) by construction. */
  def docFreq(tf: DataFrame, nDocs: Long): DataFrame =
    tf.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) + 1.0) / (col("df") + 1.0)) + 1.0)

  /** (doc_id, term, tf, tf_idf) for the top-k terms per document.
    *
    * Single DAG: N (the corpus size) rides along as a broadcast 1-row
    * cross join instead of a separate driver-side count() action — one job
    * instead of two, and the idf build stays fully lazy/optimizable. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val n = docs.select(count(lit(1)).cast("double").as("_n"))
    val idf = broadcast(
      tf.groupBy("term")
        .agg(count(lit(1)).as("df")) // tf is distinct per (doc, term)
        .crossJoin(broadcast(n))
        .withColumn("idf", log((col("_n") + 1.0) / (col("df") + 1.0)) + 1.0)
        .drop("_n"))
    val scored = tf.join(idf, "term")
      .withColumn("tf_idf", col("tf") * col("idf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf_idf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "tf_idf")
  }
}
