package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.similarity.{KMeans, Similarity}
import graft.text.QualityClassifier

/** Round-13 additions — the embedding-space hygiene suite plus two
  * delivery/gating operators:
  *
  *   - SemDeDup-style SEMANTIC dedup ([[Similarity.semanticDedup]]) —
  *     cluster-bounded embedding near-dup removal, the embedding-space
  *     sibling of the MinHash/SimHash text paths (contracts below);
  *   - semantic DECONTAMINATION ([[Similarity.semanticContamination]])
  *     — benchmark-leakage flagging by embedding similarity, map-only;
  *   - the trainable QUALITY GATE ([[QualityClassifier]]) — integer-
  *     exact batch perceptron, k training iterations replayed by the
  *     oracle as generated CTEs;
  *   - weight-BALANCED shard export ([[graft.operators.Export
  *     .balancedShards]]) — snake-striped token-weighted assignment.
  *
  * Three contracts, mirroring the ANN suite's convention
  * (`e_dedup_semantic_incremental` adds the ingest-side admission check —
  * the same closed-form planted oracle over
  * [[Similarity.semanticDedupAgainstIndex]]):
  *
  *   - `e_dedup_semantic` — FULLY value-oracled: stride centroids (every
  *     50th vector — deterministic and SQL-expressible, like
  *     [[Similarity.ivfTopK]]'s), so DuckDB replicates the whole
  *     pipeline: argmin cell assignment (ROW_NUMBER over the identical
  *     `-cos` distance with the identical centroid_id tie-break), the
  *     within-cell pair scan, the threshold filter, and the per-victim
  *     (dup_of, max_cos) aggregation. Cross-engine exactness rests on
  *     bit-identical doubles (f32→f64 widening + left-to-right
  *     accumulation on both engines — the `e_ann_brute` precedent) plus
  *     measured margins: nearest pair-to-threshold gap 2.6e-4, nearest
  *     argmin best-to-second gap 1.5e-5 at sf0.1 — both ≥10¹¹× the
  *     ~1e-16 FP divergence a non-bit-identical kernel could introduce.
  *   - `e_dedup_semantic_planted` — the TRAINED path end-to-end
  *     ([[KMeans.fit]] → dedup): k-means output isn't SQL-expressible,
  *     but planted exact copies are invariant to it — an identical
  *     embedding lands in the same cell under ANY centroids (bit-equal
  *     distances, same tie-break) and scores cos ≈ 1 ≥ 0.9999 against
  *     its original, while the strongest NATURAL pair in the data sits
  *     at cos 0.60 — so the full (is_dup, dup_of, max_cos) row of every
  *     planted victim is a closed-form oracle.
  */
object Round13Queries {

  /** DuckDB double-precision dot/norm/cosine over FLOAT[] list
    * expressions — the same f32→f64 widen + left-to-right fold the
    * engine's DotProduct kernel performs (see [[Similarity.dotFold]]),
    * so both engines produce bit-identical doubles. Same formulation as
    * the `e_ann_brute` / `e_dedup_cosine` oracles. */
  private[queries] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(list_zip($a, $b),
       |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
       |      (x, y) -> x + y)""".stripMargin

  private[queries] def normSql(a: String): String =
    s"""sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |      (x, y) -> x + y))""".stripMargin

  private[queries] def cosSql(a: String, b: String): String =
    s"""${dotSql(a, b)} /
       |    (${normSql(a)} *
       |     ${normSql(b)})""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full-pipeline value check against DuckDB; threshold 0.45 sits below
    // the corpus's natural similarity ceiling (max same-cell cosine 0.52
    // at sf0.1) so real dups fire — 7 victims at sf0.01, 18 at sf0.1.
    "e_dedup_semantic" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      val cents = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      Similarity.semanticDedup(emb, cents, threshold = 0.45)
        .select(col("vec_id"), col("centroid_id"), col("is_dup"),
          col("dup_of"), round(col("max_cos"), 6).as("max_cos"))
        .orderBy(col("vec_id"))
    }),

    // Trained end-to-end: fit k-means on the planted corpus, dedup, and
    // emit the planted victims' full decision rows. Every planted copy
    // MUST be dropped with dup_of = its original and max_cos rounding to
    // 1.0 — no natural pair reaches 0.9999 (ceiling 0.60), so the oracle
    // is closed-form over the planting rule.
    "e_dedup_semantic_planted" -> ((s, dir) => {
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val cents = KMeans.fit(corpus, k = 8, iters = 2)
      Similarity.semanticDedup(corpus, cents, threshold = 0.9999)
        .filter(col("vec_id") >= 1000000L)
        .select(col("vec_id"), col("is_dup"), col("dup_of"),
          round(col("max_cos"), 6).as("max_cos"))
        .orderBy(col("vec_id"))
    }),

    // Trainable quality gate ([[QualityClassifier]]): batch-perceptron
    // training unrolled by the oracle — k iterations of integer-exact
    // weight updates must match DuckDB bit for bit (see the operator's
    // exactness ladder). Output = the final integer weight vector.
    "d_classifier_train" -> ((s, dir) => {
      val w = QualityClassifier.fit(load(s, dir, "documents"),
        QualityClassifier.enLabel, iters = ClassifierIters)
      s.range(1).select(
        (0 until QualityClassifier.Dim).map(j => lit(w(j)).as(s"w$j")): _*)
    }),

    // Train + map-only serve end to end: per-doc margin (1e-6 units),
    // prediction, and label under the trained weights.
    "d_classifier_score" -> ((s, dir) => {
      QualityClassifier.score(load(s, dir, "documents"),
        QualityClassifier.enLabel, iters = ClassifierIters)
        .orderBy(col("doc_id"))
    }),

    // Calibration/reliability bins over the trained gate's margins:
    // fixed-width margin buckets vs observed positive rate — is the
    // score monotone in the actual label rate? Pure integer arithmetic
    // over the oracled margin_e6 (bin keys offset-shifted positive
    // because Spark `div` truncates while DuckDB `//` floors).
    "d_calibration" -> ((s, dir) => {
      QualityClassifier.calibrationBins(
          QualityClassifier.score(load(s, dir, "documents"),
            QualityClassifier.enLabel, iters = ClassifierIters),
          binWidth = 10000000L)
        .orderBy(col("bin"))
    }),

    // Hard-negative mining ([[Similarity.hardNegatives]]): top-3 most
    // similar DIFFERENT-label corpus vectors per labeled anchor — the
    // exact brute baseline (query side broadcast, corpus never
    // shuffles), fully value-oracled like e_ann_brute.
    "e_hard_negatives" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb, k = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("neighbor_label"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Quality-ranked token-budget cut ([[graft.text.BudgetSelect]]):
    // histogram-cut selection — whole bins best-first, exact prefix
    // inside the one cut bin; all-integer arithmetic, so the three-stage
    // oracle matches exactly.
    "d_budget_select" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      graft.text.BudgetSelect.selectToBudget(docs, "doc_id",
          round(graft.text.TextOps.qualityScore(col("text")) * 1e6)
            .cast("long"),
          graft.text.TextOps.tokenCountWs(col("text")).cast("long"),
          budget = 30000L, binWidth = 1000L)
        .orderBy(col("doc_id"))
    }),

    // IVF REBALANCE ([[Similarity.ivfRebalance]]) under the gate: split
    // every cell (cap 20 forces it), then probe FULL — the contract is
    // correctness preservation (full probe == brute force on any valid
    // codes index), so every planted copy must come back at cosine 1.
    // Partial-probe recall after a rebalance is spec'd empirically; the
    // oracle pins the invariant that holds by construction.
    "e_ann_ivf_rebalanced" -> ((s, dir) => {
      val corpus = Round7Queries.plantedEmb(s, dir, 30)
      val cents = corpus.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      // iters=1: the planted/full-probe contract is invariant to HOW
      // WELL the split cells train (identical vectors co-locate under
      // any children; full probe == brute on any valid index), so the
      // gate query buys nothing from a second Lloyd round
      val (nc, ni) = Similarity.ivfRebalance(
        Similarity.ivfAssign(corpus, cents), cents,
        maxCellSize = 20, subK = 4, iters = 1)
      val queries = load(s, dir, "embeddings").filter(col("vec_id") < 30)
      Similarity.ivfTopKFromIndex(queries, ni, k = 1, nc, nprobe = 100000)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("query_id"))
    }),

    // Semantic decontamination ([[Similarity.semanticContamination]]):
    // every-97th vector is the "benchmark" slice, the rest the corpus.
    // MAP-ONLY corpus pass (eval inlined as a literal with precomputed
    // norms) — plan-pinned: zero joins, zero hash shuffles. The oracle
    // replays the exact (dot/evalNorm)/corpusNorm association and the
    // strict-max/earliest-id tie-break.
    "e_decontaminate_semantic" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings")
      Similarity.semanticContamination(
        emb.filter(pmod(col("vec_id"), lit(97)) =!= 0),
        emb.filter(pmod(col("vec_id"), lit(97)) === 0),
        threshold = 0.45)
        .select(col("vec_id"), col("nearest_eval_id"),
          round(col("max_eval_cos"), 6).as("max_eval_cos"),
          col("contaminated"))
        .orderBy(col("vec_id"))
    }),

    // Weight-balanced shard export ([[graft.operators.Export
    // .balancedShards]]): snake-striped token-weighted assignment;
    // output is the per-shard manifest whose near-equal totals ARE the
    // operator's contract (hash sharding leaves heavy-tailed weight
    // skew; balanced shards keep 1000 trainers in lockstep).
    "d_export_balanced" -> ((s, dir) => {
      val weighted = load(s, dir, "documents").select(col("doc_id"),
        graft.text.TextOps.tokenCountWs(col("text")).cast("long").as("w"))
      graft.operators.Export
        .balancedShards(weighted, "doc_id", col("w"),
          numShards = 8, numSlices = 4)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("total_w"))
        .orderBy(col("shard"))
    }),

    // The ingest-side ADMISSION check ([[Similarity
    // .semanticDedupAgainstIndex]]): corpus = the immutable index, the 30
    // planted copies arrive as the new batch — every one must be refused
    // with dup_of = its original (same closed-form contract as the
    // planted twin; the batch side broadcasts, the index never shuffles).
    "e_dedup_semantic_incremental" -> ((s, dir) => {
      val emb = load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val cents = KMeans.fit(emb, k = 8, iters = 2)
      val batch = emb.filter(col("vec_id") < 30)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.semanticDedupAgainstIndex(batch,
        Similarity.ivfAssign(emb, cents), cents, threshold = 0.9999)
        .select(col("vec_id"), col("is_dup"), col("dup_of"),
          round(col("max_cos"), 6).as("max_cos"))
        .orderBy(col("vec_id"))
    })
  )

  private val ClassifierIters = 3

  /** Generated perceptron-training CTE chain (the BPE-oracle technique
    * applied to gradient-free model training): `feat` mirrors
    * [[QualityClassifier.features]] expression for expression, then each
    * iteration CTE adds the integer update sums of the rows the PREVIOUS
    * weights misclassify. Everything compared downstream is either a
    * BIGINT or a bit-identical double — see the operator scaladoc. */
  private def classifierCtes: String = {
    val dim = QualityClassifier.Dim
    val comps = QueryShared.qualityComponentsSql
    val featSql =
      s"""feat AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         |    CAST(1.0 AS DOUBLE) AS x0,
         |${comps.zipWithIndex.map { case (c, j) =>
              s"    $c AS x${j + 1}" }.mkString(",\n")}
         |  FROM documents),
         |featc AS (
         |  SELECT *,
         |${(0 until dim).map(j =>
              s"    CAST(ROUND(x$j * 1000000.0) AS BIGINT) AS c$j")
              .mkString(",\n")}
         |  FROM feat),
         |w0 AS (SELECT ${(0 until dim).map(j =>
              s"CAST(0 AS BIGINT) AS w$j").mkString(", ")})""".stripMargin
    val iterSql = (1 to ClassifierIters).map { i =>
      val m = (0 until dim).map(j => s"w.w$j * x$j").mkString(" + ")
      val sums = (0 until dim).map(j =>
        s"      CAST(SUM(CASE WHEN y * ($m) <= 0 THEN y * c$j ELSE 0 END) AS BIGINT) AS d$j")
        .mkString(",\n")
      s"""w$i AS (
         |  SELECT ${(0 until dim).map(j => s"w.w$j + u.d$j AS w$j").mkString(", ")}
         |  FROM w${i - 1} w CROSS JOIN (
         |    SELECT
         |$sums
         |    FROM featc, w${i - 1} w) u)""".stripMargin
    }.mkString(",\n")
    s"WITH $featSql,\n$iterSql"
  }

  val oracleSql: Map[String, String] = Map(

    "d_classifier_train" ->
      s"""$classifierCtes
         |SELECT ${(0 until QualityClassifier.Dim).map(j => s"w$j")
              .mkString(", ")} FROM w$ClassifierIters""".stripMargin,

    "d_calibration" -> {
      val m = (0 until QualityClassifier.Dim).map(j => s"w.w$j * x$j")
        .mkString(" + ")
      s"""$classifierCtes,
         |scored AS (
         |  SELECT doc_id, CAST(ROUND($m) AS BIGINT) AS margin_e6, y
         |  FROM featc, w$ClassifierIters w),
         |b AS (
         |  SELECT ((margin_e6 + 1000000000000) // 10000000) - 100000 AS bin,
         |    margin_e6, y
         |  FROM scored)
         |SELECT bin, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  (CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000) // COUNT(*) AS pos_ppm,
         |  CAST(SUM(margin_e6) AS BIGINT) AS sum_margin_e6
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin
    },

    "d_classifier_score" -> {
      val m = (0 until QualityClassifier.Dim).map(j => s"w.w$j * x$j")
        .mkString(" + ")
      s"""$classifierCtes
         |SELECT doc_id, CAST(ROUND($m) AS BIGINT) AS margin_e6,
         |  ($m) > 0 AS pred_en, y
         |FROM featc, w$ClassifierIters w ORDER BY doc_id""".stripMargin
    },

    "e_dedup_semantic" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |assigned AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT e.vec_id, c.centroid_id, e.embedding,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY -(${cosSql("e.embedding", "c.centroid")}) ASC,
         |          c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents c) t
         |  WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${cosSql("a.embedding", "b.embedding")} AS c
         |  FROM assigned a JOIN assigned b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id),
         |dups AS (
         |  SELECT id_b, MIN(id_a) AS dup_of, MAX(c) AS max_cos
         |  FROM pairs WHERE c >= 0.45 GROUP BY 1)
         |SELECT a.vec_id, a.centroid_id, d.dup_of IS NOT NULL AS is_dup,
         |  d.dup_of, ROUND(d.max_cos, 6) AS max_cos
         |FROM assigned a LEFT JOIN dups d ON d.id_b = a.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    "e_dedup_semantic_planted" ->
      """SELECT vec_id + 1000000 AS vec_id, TRUE AS is_dup,
        |  vec_id AS dup_of, CAST(1.0 AS DOUBLE) AS max_cos
        |FROM embeddings WHERE vec_id < 30 ORDER BY vec_id""".stripMargin,

    "e_dedup_semantic_incremental" ->
      """SELECT vec_id + 1000000 AS vec_id, TRUE AS is_dup,
        |  vec_id AS dup_of, CAST(1.0 AS DOUBLE) AS max_cos
        |FROM embeddings WHERE vec_id < 30 ORDER BY vec_id""".stripMargin,

    "e_ann_ivf_rebalanced" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
        |  CAST(1.0 AS DOUBLE) AS cos_sim
        |FROM embeddings WHERE vec_id < 30 ORDER BY query_id""".stripMargin,

    "e_hard_negatives" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    c.label AS neighbor_label,
         |    ${cosSql("q.embedding", "c.embedding")} AS cos_sim
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id <> c.vec_id
         |    AND q.label IS NOT NULL AND c.label IS NOT NULL
         |    AND q.label <> c.label
         |  WHERE q.vec_id < 20)
         |SELECT query_id, rank, neighbor_id, neighbor_label,
         |  ROUND(cos_sim, 6) AS cos_sim
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "d_budget_select" -> {
      val qual = QueryShared.qualitySql
      s"""WITH q0 AS (
         |  SELECT doc_id,
         |    CAST(ROUND($qual * 1000000) AS BIGINT) AS quality_e6,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w
         |  FROM documents),
         |b2 AS (SELECT *, quality_e6 // 1000 AS bin FROM q0),
         |hist AS (SELECT bin, SUM(w) AS bw FROM b2 GROUP BY 1),
         |hc AS (SELECT bin, bw,
         |  SUM(bw) OVER (ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM hist),
         |cutb AS (SELECT bin, cum - bw AS bef FROM hc
         |  WHERE cum - bw <= 30000 AND cum > 30000),
         |sel_cut AS (
         |  SELECT doc_id, quality_e6, w FROM (
         |    SELECT b2.doc_id, b2.quality_e6, b2.w, c.bef,
         |      SUM(b2.w) OVER (ORDER BY b2.quality_e6 DESC, b2.doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
         |    FROM b2 JOIN cutb c ON b2.bin = c.bin) t
         |  WHERE c2 <= 30000 - bef)
         |SELECT doc_id, quality_e6, w FROM (
         |  SELECT doc_id, quality_e6, w FROM b2
         |  WHERE bin IN (SELECT bin FROM hc WHERE cum <= 30000)
         |  UNION ALL SELECT * FROM sel_cut) u
         |ORDER BY doc_id""".stripMargin
    },

    "e_decontaminate_semantic" ->
      s"""WITH ev AS (
         |  SELECT vec_id AS eval_id, embedding AS e_emb,
         |    ${normSql("embedding")} AS nb
         |  FROM embeddings WHERE vec_id % 97 = 0),
         |corp AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS na
         |  FROM embeddings WHERE vec_id % 97 <> 0),
         |sc AS (
         |  SELECT c.vec_id, c.na, e.eval_id,
         |    ${dotSql("c.embedding", "e.e_emb")} / e.nb AS s
         |  FROM corp c CROSS JOIN ev e)
         |SELECT vec_id, eval_id AS nearest_eval_id,
         |  ROUND(s / na, 6) AS max_eval_cos,
         |  (s / na) >= 0.45 AS contaminated
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY s DESC, eval_id ASC) AS rn
         |  FROM sc) t
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "d_export_balanced" ->
      """WITH wt AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w
        |  FROM documents),
        |rk AS (
        |  SELECT w, ROW_NUMBER() OVER (PARTITION BY doc_id % 4
        |    ORDER BY w DESC, doc_id ASC) - 1 AS r
        |  FROM wt),
        |sh AS (
        |  SELECT w, CASE WHEN (r // 8) % 2 = 0 THEN r % 8
        |    ELSE 7 - (r % 8) END AS shard
        |  FROM rk)
        |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(w) AS BIGINT) AS total_w
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
