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
    }),

    // Blockhash perceptual signature per image — the oracle replays the
    // integer block-mean bit test byte-for-byte (ASCII corpus: unicode(c)
    // == byte), so a single miscounted byte or block boundary flips bits.
    "m_phash" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.imagePHash(media).toDF()
        .select(col("media_id"), col("n_bytes"), col("phash"))
        .orderBy(col("media_id"))
    }),

    // Near-dup image pairs via the multi-probe banded LSH (pigeonhole-
    // exact at hamming <= 3, so the banded result EQUALS the oracle's
    // all-pairs xor/bit_count scan). The corpus plants SQL-replayable
    // duplicates: exact copies (hamming 0 guaranteed) and last-byte
    // tweaks (hamming = whatever the block math says — both engines
    // compute it independently).
    "m_phash_pairs" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("text"), col("n_chars"))
      val copies = base.filter(col("doc_id") % 21 === 0)
        .select((col("doc_id") + 999999).as("doc_id"), col("text"), col("n_chars"))
      val tweaked = base.filter(col("doc_id") % 21 === 6)
        .select((col("doc_id") + 1999998).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 1)"), lit("~")).as("text"),
          col("n_chars"))
      val media = Multimodal.mediaFromDocuments(
        base.unionByName(copies).unionByName(tweaked))
      Multimodal.pHashPairs(media)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Voice-activity segments: threshold windows (mean byte > 94, the
    // integer cross-multiplication) -> gaps-and-islands runs per clip.
    // One media_id shuffle end-to-end.
    "m_vad_segments" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.vadSegments(media, window = 400, tau = 94)
        .orderBy(col("media_id"), col("seg_idx"))
    }),

    // Cross-video near-dup FRAMES (content-ID): per-frame blockhash
    // signatures through the banded LSH; planted full-video copies
    // guarantee hamming-0 frame matches. Pigeonhole-exact at hamming<=3,
    // so the banded result equals the oracle's all-pairs scan.
    "m_frame_dedup" -> ((s, dir) => {
      val docs = load(s, dir, "documents").filter(col("doc_id") < 500)
      val base = docs.select(col("doc_id"), col("text"), col("n_chars"))
      val copies = base.filter(col("doc_id") % 21 === 2)
        .select((col("doc_id") + 999999).as("doc_id"), col("text"),
          col("n_chars"))
      val media = Multimodal.mediaFromDocuments(base.unionByName(copies))
      Multimodal.frameDupPairs(media)
        .orderBy(col("media_a"), col("frame_a"), col("media_b"),
          col("frame_b"))
    }),

    // Keyframes: frame 0 + the first frame of each new scene — the
    // one-representative-per-scene sampling; pure composition over the
    // oracled scene-cut chain.
    "m_keyframes" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.keyframes(media, tau = 40)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // Scene cuts: per-frame intensity sums -> lag delta vs tau*sliceLen.
    // One hash shuffle on media_id (the lag window); frame extraction
    // stays inside the codec partition pass.
    "m_scene_cuts" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(load(s, dir, "documents"))
      Multimodal.sceneCuts(media, tau = 40)
        .withColumn("is_cut", col("is_cut").cast("int"))
        .orderBy(col("media_id"), col("frame_idx"))
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
        |FROM documents ORDER BY media_id""".stripMargin,
    "m_phash" ->
      """WITH img AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |             FROM documents WHERE doc_id % 3 = 0),
        |ch AS (SELECT doc_id, n, ((i - 1) * 60) // n AS b,
        |              CAST(unicode(text[i]) AS BIGINT) AS v
        |       FROM img, unnest(range(1, n + 1)) AS t(i)),
        |blk AS (SELECT doc_id, n, b, SUM(v) AS bsum, COUNT(*) AS blen
        |        FROM ch GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, SUM(v) AS total FROM ch GROUP BY 1),
        |ph AS (
        |  SELECT blk.doc_id,
        |    CAST(SUM(CASE WHEN bsum * blk.n > total * blen
        |         THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
        |         ELSE 0 END) AS BIGINT) AS phash
        |  FROM blk JOIN tot USING (doc_id)
        |  GROUP BY blk.doc_id)
        |SELECT img.doc_id AS media_id, CAST(img.n AS INTEGER) AS n_bytes,
        |  CAST(COALESCE(ph.phash, 0) AS BIGINT) AS phash
        |FROM img LEFT JOIN ph ON ph.doc_id = img.doc_id
        |ORDER BY media_id""".stripMargin,
    "m_phash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 999999, text FROM documents WHERE doc_id % 21 = 0
        |  UNION ALL
        |  SELECT doc_id + 1999998, substr(text, 1, length(text) - 1) || '~'
        |  FROM documents WHERE doc_id % 21 = 6
        |),
        |img AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        |        FROM corpus WHERE doc_id % 3 = 0),
        |ch AS (SELECT doc_id, n, ((i - 1) * 60) // n AS b,
        |              CAST(unicode(text[i]) AS BIGINT) AS v
        |       FROM img, unnest(range(1, n + 1)) AS t(i)),
        |blk AS (SELECT doc_id, n, b, SUM(v) AS bsum, COUNT(*) AS blen
        |        FROM ch GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, SUM(v) AS total FROM ch GROUP BY 1),
        |ph0 AS (SELECT blk.doc_id,
        |         CAST(SUM(CASE WHEN bsum * blk.n > total * blen
        |              THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS h
        |       FROM blk JOIN tot USING (doc_id) GROUP BY blk.doc_id),
        |ph AS (SELECT img.doc_id, CAST(COALESCE(ph0.h, 0) AS BIGINT) AS h
        |       FROM img LEFT JOIN ph0 ON ph0.doc_id = img.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "m_vad_segments" ->
      """WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
        |ch AS (SELECT doc_id, (i - 1) // 400 AS w,
        |              CAST(unicode(text[i]) AS BIGINT) AS v
        |       FROM a, unnest(range(1, length(text) + 1)) AS t(i)),
        |wins AS (SELECT doc_id, w, COUNT(*) AS n, SUM(v) AS e
        |         FROM ch GROUP BY 1, 2),
        |act AS (SELECT doc_id, w, e FROM wins WHERE e > n * 94),
        |grp AS (SELECT doc_id, w, e,
        |               w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w)
        |                 AS g
        |        FROM act),
        |seg AS (SELECT doc_id, g, MIN(w) AS start_w, MAX(w) AS end_w,
        |               COUNT(*) AS n_windows, SUM(e) AS seg_energy
        |        FROM grp GROUP BY 1, 2)
        |SELECT doc_id AS media_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_w)
        |    AS INTEGER) AS seg_idx,
        |  CAST(start_w AS INTEGER) AS start_w,
        |  CAST(end_w AS INTEGER) AS end_w,
        |  CAST(n_windows AS INTEGER) AS n_windows,
        |  CAST(seg_energy AS BIGINT) AS seg_energy
        |FROM seg ORDER BY media_id, seg_idx""".stripMargin,
    "m_frame_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, n_chars FROM documents WHERE doc_id < 500
        |  UNION ALL
        |  SELECT doc_id + 999999, text, n_chars FROM documents
        |  WHERE doc_id < 500 AND doc_id % 21 = 2
        |),
        |vid AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |               CAST(n_chars % 30 + 1 AS BIGINT) AS nf
        |        FROM corpus WHERE doc_id % 3 = 2),
        |v2 AS (SELECT doc_id, text, n, nf, n // nf AS sl
        |       FROM vid WHERE n // nf > 0),
        |ch AS (SELECT doc_id, (i - 1) // sl AS f,
        |              (((i - 1) % sl) * 60) // sl AS b,
        |              CAST(unicode(text[i]) AS BIGINT) AS v
        |       FROM v2, unnest(range(1, n + 1)) AS t(i)
        |       WHERE (i - 1) // sl < nf),
        |blk AS (SELECT doc_id, f, b, SUM(v) AS bsum, COUNT(*) AS blen
        |        FROM ch GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, f, SUM(v) AS total, COUNT(*) AS nn
        |        FROM ch GROUP BY 1, 2),
        |ph AS (SELECT blk.doc_id, blk.f,
        |         CAST(SUM(CASE WHEN bsum * nn > total * blen
        |              THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
        |              ELSE 0 END) AS BIGINT) AS h
        |       FROM blk JOIN tot
        |         ON tot.doc_id = blk.doc_id AND tot.f = blk.f
        |       GROUP BY 1, 2)
        |SELECT a.doc_id AS media_a, CAST(a.f AS INTEGER) AS frame_a,
        |  b.doc_id AS media_b, CAST(b.f AS INTEGER) AS frame_b,
        |  CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming
        |FROM ph a JOIN ph b
        |  ON (a.doc_id * 1048576 + a.f) < (b.doc_id * 1048576 + b.f)
        |  AND a.doc_id <> b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 3
        |ORDER BY media_a, frame_a, media_b, frame_b""".stripMargin,
    "m_keyframes" ->
      """WITH vid AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |                    CAST(n_chars % 30 + 1 AS BIGINT) AS nf
        |             FROM documents WHERE doc_id % 3 = 2),
        |v2 AS (SELECT doc_id, text, n, nf, n // nf AS sl FROM vid),
        |chars AS (SELECT doc_id, (i - 1) // sl AS f,
        |                 CAST(unicode(text[i]) AS BIGINT) AS v
        |          FROM v2, unnest(range(1, n + 1)) AS t(i)
        |          WHERE sl > 0 AND (i - 1) // sl < nf),
        |frames AS (SELECT doc_id, f, sl FROM v2, unnest(range(0, nf)) AS t(f)),
        |sums AS (SELECT fr.doc_id, fr.f, fr.sl, COALESCE(SUM(c.v), 0) AS fsum
        |         FROM frames fr LEFT JOIN chars c
        |           ON c.doc_id = fr.doc_id AND c.f = fr.f
        |         GROUP BY 1, 2, 3),
        |lagd AS (SELECT doc_id, f, sl, fsum,
        |                ABS(fsum - LAG(fsum) OVER (PARTITION BY doc_id ORDER BY f)) AS delta
        |         FROM sums)
        |SELECT media_id, frame_idx FROM (
        |  SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx
        |  FROM lagd WHERE f > 0 AND delta > sl * 40
        |  UNION
        |  SELECT doc_id AS media_id, 0 AS frame_idx FROM vid) u
        |ORDER BY media_id, frame_idx""".stripMargin,
    "m_scene_cuts" ->
      """WITH vid AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
        |                    CAST(n_chars % 30 + 1 AS BIGINT) AS nf
        |             FROM documents WHERE doc_id % 3 = 2),
        |v2 AS (SELECT doc_id, text, n, nf, n // nf AS sl FROM vid),
        |chars AS (SELECT doc_id, (i - 1) // sl AS f,
        |                 CAST(unicode(text[i]) AS BIGINT) AS v
        |          FROM v2, unnest(range(1, n + 1)) AS t(i)
        |          WHERE sl > 0 AND (i - 1) // sl < nf),
        |frames AS (SELECT doc_id, f, sl FROM v2, unnest(range(0, nf)) AS t(f)),
        |sums AS (SELECT fr.doc_id, fr.f, fr.sl, COALESCE(SUM(c.v), 0) AS fsum
        |         FROM frames fr LEFT JOIN chars c
        |           ON c.doc_id = fr.doc_id AND c.f = fr.f
        |         GROUP BY 1, 2, 3),
        |lagd AS (SELECT doc_id, f, sl, fsum,
        |                ABS(fsum - LAG(fsum) OVER (PARTITION BY doc_id ORDER BY f)) AS delta
        |         FROM sums)
        |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(fsum AS BIGINT) AS fsum, CAST(delta AS BIGINT) AS delta,
        |  CAST(CASE WHEN delta > sl * 40 THEN 1 ELSE 0 END AS INTEGER) AS is_cut
        |FROM lagd WHERE f > 0 ORDER BY media_id, frame_idx""".stripMargin
  )
}
