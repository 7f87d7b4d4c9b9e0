package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.text.Boilerplate

/** Round-15 additions — corpus-hygiene and serving-side operators:
  *
  *   - cross-document boilerplate removal over content-defined chunks
  *     ([[Boilerplate]]) — the CCNet "repeated paragraph" stage;
  *
  * Exactness: boilerplate semantics are pure string/count algebra over
  * the md5 chunk convention — zero float surface, so the oracle replays
  * the whole pipeline (chunking, distinct-doc frequency, rebuild).
  */
object Round15Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Boilerplate strip: chunks recurring in ≥ 2 distinct docs are
    // removed from EVERY doc (no canonical copy kept — the
    // decontamination direction, like d_substr_strip); receipt counts +
    // rebuilt text per doc. At sf0.01 ~217 digests are cross-doc
    // (d_chunk_dedup's readout is this operator's mark set).
    "d_boilerplate_strip" -> ((s, dir) => {
      Boilerplate.strip(load(s, dir, "documents"), "doc_id", "text",
          w = 4, modulus = 8, minDocs = 2)
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "d_boilerplate_strip" ->
      s"""WITH ${Round14Queries.cdcSql("documents", "")},
         |fr AS (
         |  SELECT chunk_md5 FROM chunks
         |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |mk AS (
         |  SELECT c.doc_id, c.chunk_id, c.start_tok, c.n_toks,
         |    (f.chunk_md5 IS NOT NULL) AS boiler
         |  FROM chunks c LEFT JOIN fr f USING (chunk_md5))
         |SELECT m.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(*) FILTER (WHERE NOT boiler) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(
         |    CASE WHEN NOT boiler THEN array_to_string(
         |      array_slice(t, start_tok, start_tok + n_toks - 1), ' ') END,
         |    ' ' ORDER BY chunk_id), '') AS text
         |FROM mk m JOIN tt USING (doc_id)
         |GROUP BY m.doc_id ORDER BY m.doc_id""".stripMargin
  )
}
