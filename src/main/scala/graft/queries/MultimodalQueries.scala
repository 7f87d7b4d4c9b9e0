package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.multimodal.Multimodal

/** Multimodal plumbing exercised end-to-end: documents → synthetic binary
  * payloads (encode) → mapPartitions decode/extract (the stubbed-codec
  * batch path) → features. Oracles validate the *round-trip* in closed form
  * from the source table — if the binary plumbing drops, reorders, or
  * corrupts a byte, the hashes diverge.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "m_image_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.imageFeatures(media).toDF()
        .select(col("media_id"), col("width"), col("height"), col("n_bytes"),
          round(col("mean_intensity"), 6).as("mean_intensity"))
        .orderBy(col("media_id"))
    }),

    "m_frame_sample" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.sampleFrames(media, every = 5).toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_payload")).as("frame_len"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    "m_audio_windows" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.audioWindows(media, window = 400).toDF()
        .select(col("media_id"), col("window_idx"), col("n_samples"),
          col("energy"))
        .orderBy(col("media_id"), col("window_idx"))
    }),

    "m_resize_roundtrip" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      val resized = Multimodal.resize(media, 224, 224)
      Multimodal.imageFeatures(resized).toDF()
        .select(col("media_id"), col("width"), col("height"), col("n_bytes"))
        .orderBy(col("media_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "m_image_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(n_chars % 64 + 16 AS INTEGER) AS width,
        |  CAST(n_chars % 48 + 16 AS INTEGER) AS height,
        |  CAST(length(text) AS INTEGER) AS n_bytes,
        |  ROUND(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |        i -> CAST(unicode(text[i]) AS BIGINT))),
        |      (a, b) -> a + b) AS DOUBLE) / length(text), 6) AS mean_intensity
        |FROM documents ORDER BY media_id""".stripMargin,
    "m_audio_windows" ->
      """WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
        |ch AS (SELECT doc_id, (i - 1) // 400 AS w, unicode(text[i]) AS v
        |       FROM a, unnest(range(1, length(text) + 1)) AS t(i))
        |SELECT doc_id AS media_id, CAST(w AS INTEGER) AS window_idx,
        |  CAST(COUNT(*) AS INTEGER) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS energy
        |FROM ch GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "m_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(length(text) // (n_chars % 30 + 1) AS INTEGER) AS frame_len
        |FROM documents, unnest(range(0, n_chars % 30 + 1, 5)) AS t(f)
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin,
    "m_resize_roundtrip" ->
      """SELECT doc_id AS media_id, 224 AS width, 224 AS height,
        |  CAST(length(text) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
