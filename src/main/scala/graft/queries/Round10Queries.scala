package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.IncrementalDedup

/** Round-10 additions — incremental corpus maintenance:
  *
  *   - dedup of an ARRIVING batch against a persisted corpus signature
  *     index (build → save → load → probe inside the query, the
  *     train-once/serve-many shape for dedup), with the planted-duplicate
  *     oracle contract: identical text collides in every band and scores
  *     exact Jaccard 1.0, for batch-vs-corpus AND batch-vs-batch pairs.
  */
object Round10Queries {

  private val PlantA = 1000000L
  private val PlantB = 2000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Corpus = documents[0,500); arrivals = copies of the first 40 docs
    // (ids +1M — batch-vs-CORPUS dups) plus copies of the first 20 (ids
    // +2M — these duplicate the +1M arrivals too, so (id+1M, id+2M) are
    // the batch-vs-BATCH dups). The filter id_b = id_a + 1M keeps exactly
    // one planted family of each kind: (id, id+1M) for id<40 and
    // (id+1M, id+2M) for id<20. Corpus-vs-corpus pairs are structurally
    // absent from the operator's output (the index side never self-joins).
    "d_dedup_incremental" -> ((s, dir) => {
      val docs = load(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      val statePath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_dedup_idx_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      IncrementalDedup.saveIndex(
        IncrementalDedup.buildIndex(docs, "doc_id", "text"), statePath)
      val index = IncrementalDedup.loadIndex(s, statePath)
      val batch = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + PlantA).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + PlantB).as("doc_id"), col("text")))
      IncrementalDedup.pairsAgainstIndex(batch, index, "doc_id", "text",
          minJaccard = 0.0)
        .filter(col("id_b") === col("id_a") + PlantA)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jac"))
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // ≥3 lowercase-alnum tokens ⇔ the doc has a 3-gram and enters the
    // MinHash path at all (same predicate as d_dedup_minhash_planted)
    "d_dedup_incremental" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, 1.0 AS jac
        |FROM documents
        |WHERE doc_id < 40
        |  AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3
        |UNION ALL
        |SELECT doc_id + 1000000 AS id_a, doc_id + 2000000 AS id_b, 1.0 AS jac
        |FROM documents
        |WHERE doc_id < 20
        |  AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3
        |ORDER BY id_a, id_b""".stripMargin
  )
}
