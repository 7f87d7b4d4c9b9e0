package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction (MaxSim) retrieval: query and document
  * are each a BAG of token vectors, and
  *
  *   score(q, d) = Σ_{query token t} max_{doc token u} cos(t, u)
  *
  * — every query token finds its best-matching document token, and the
  * per-token maxima add. This ranks long documents by their best local
  * regions instead of one pooled vector, the retrieval quality step
  * between single-vector ANN and a full cross-encoder.
  *
  * Exactness: the inner max is over bit-identical doubles (the
  * e_ann_brute cosine argument), and the outer sum is over
  * `round(max·1e6)` BIGINTs — float addition order never matters, so the
  * ranking replays exactly in SQL. Ties break (score DESC, doc_id).
  *
  * Scale shape: the query batch (tokens included) broadcasts — the
  * corpus-sized token table never shuffles for the probe. The token-max
  * aggregation keys on (query, doc, q_tok) with map-side partial max, so
  * the first exchange carries at most |docs|·|query tokens| reduced rows,
  * and the score sum + rank reuse one (query, doc)-grained exchange.
  * Production deployments should rerank an ANN SHORTLIST
  * ([[maxSimRerank]]) rather than score the whole corpus
  * ([[maxSimTopK]], the exact/gate form): candidates × tokens is the
  * bounded unit of work, the same funnel contract as
  * [[Similarity.mrlTopK]].
  */
object LateInteraction {

  private def scoreAndRank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .groupBy(col("query_id"), col("doc_id"), col("q_tok"))
      .agg(max(col("_cos")).as("mx"))
      .withColumn("m", round(col("mx") * lit(1000000.0)).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("m")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Quantized SUM-pool of a token bag: per (id, dim), Σ round(x·1e6)
    * over the bag's tokens — the pooled single vector a coarse stage
    * ranks on, with BIGINT components so the pooled dot is exact (a
    * float mean would make pooled scores accumulation-order-dependent;
    * sum-pooling differs from mean-pooling by the per-doc token count,
    * which cancels NOWHERE here because only ranking under a fixed
    * query matters — callers needing means divide by `n_tokens`).
    * Output `(id, n_tokens, pool ARRAY<BIGINT>)`; `dims` fixes the
    * array width (rows with other widths fail LOUD — the
    * [[graft.functions.SignedProjectExpr]] malformed-input contract).
    *
    * Exchange shape: ONE native [[graft.functions.PoolSumAgg]]
    * aggregate — each map task folds its tokens into a (dims+1)-slot
    * Long buffer and the shuffle carries one buffer per (id × task),
    * vs the old (id, dim) explode's |tokens|·dims shuffle rows (the
    * SCALE.md-named 100 TB wall; the explode twin survives as
    * [[poolSumExplode]] and the bit-parity is spec-pinned — Long sums
    * are associative-exact, so the two shapes can never diverge). */
  def poolSum(vecs: DataFrame, idCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"poolSum: dims=$dims must be >= 1")
    vecs.groupBy(col(idCol).as("id"))
      .agg(graft.functions.PoolSum.pool_sum(col("embedding"), dims).as("_p"))
      .select(col("id"), col("_p.n_tokens").as("n_tokens"),
        col("_p.pool").as("pool"))
  }

  /** The declarative (id, dim) explode twin of [[poolSum]] — kept as
    * the parity reference (LateInteractionSpec pins bit-equality): the
    * same quantize-round-sum pipeline expressed with posexplode +
    * two exchanges. NOT the serving path — it ships |tokens|·dims
    * shuffle rows where the native aggregate ships one buffer per
    * (id × map task). */
  private[graft] def poolSumExplode(vecs: DataFrame, idCol: String,
                                    dims: Int): DataFrame = {
    require(dims >= 1, s"poolSum: dims=$dims must be >= 1")
    // the width/null checks live INSIDE the value expression — a
    // separate assert_true column would be dead-column-pruned by the
    // optimizer and never fire (observed); raise_error's NullType
    // coerces to the array branch type. Null ELEMENTS must raise too:
    // size() counts them, round(null) stays null, and sum() would skip
    // them — a silently short pooled component instead of a loud error
    // (the SignedProjectExpr malformed-input discipline).
    val q = when(size(col("embedding")) === dims &&
          !exists(col("embedding"), x => x.isNull),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")))
      .otherwise(raise_error(
        lit(s"poolSum: embedding width <> $dims or null element"))
        .cast("array<long>"))
    vecs.select(col(idCol).as("id"), posexplode(q).as(Seq("dim", "v")))
      .groupBy(col("id"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("id"))
      .agg(max(col("n")).as("n_tokens"),
        array_sort(collect_list(struct(col("dim"), col("s")))).as("_ps"))
      .select(col("id"), col("n_tokens"),
        transform(col("_ps"), p => p.getField("s")).as("pool"))
  }

  /** The full late-interaction serving funnel: pooled coarse ranking
    * shortlists `shortlist` docs per query, MaxSim reranks the
    * shortlist to top-k — pooled vectors read 1/|tokens| of the bytes,
    * token bags are fetched for shortlisted docs only, and every stage
    * is engine-exact so the whole funnel SQL-replays. The coarse key is
    * the MEAN-normalized pooled dot, `dot / n_tokens` as one exact
    * double (sum-pooled dots scale with the DOC's token count, so an
    * unnormalized shortlist systematically favors long documents over
    * the short doc MaxSim would rank first; the query-side count is a
    * per-query constant and cancels in ranking, the doc-side count does
    * not). Both operands are exact BIGINTs below 2^53, so the single
    * division is the identical correctly-rounded double in any engine —
    * the cos_sim ranking precedent — and that precondition is CHECKED
    * per pair (dims·max|q_i|·max|c_i| ≤ 2^53, raise_error past it; see
    * maxSimFunnelWith). Ties break on doc_id. */
  def maxSimFunnel(queryVecs: DataFrame, docVecs: DataFrame, k: Int,
                   dims: Int, shortlist: Int): DataFrame =
    maxSimFunnelWith(queryVecs, docVecs,
      poolSum(docVecs, "doc_id", dims), k, dims, shortlist)

  /** [[maxSimFunnel]] against a PRE-POOLED corpus ([[poolSum]] output,
    * persisted via [[TrainedState.savePooled]] and reloaded with
    * [[TrainedState.loadPooled]] — dims recorded in the artifact, width
    * checked at write, schema fail-fast at load) — pooling the static
    * side is corpus-sized work that a per-trigger serving loop must not
    * repeat ([[graft.streaming.StreamingAnn.serveMaxSimFunnelFromSaved]]
    * is that serving path). */
  def maxSimFunnelWith(queryVecs: DataFrame, docVecs: DataFrame,
                       pooledDocs: DataFrame, k: Int, dims: Int,
                       shortlist: Int): DataFrame = {
    require(shortlist >= k, s"maxSimFunnel: shortlist=$shortlist must be >= k=$k")
    val pq = broadcast(poolSum(queryVecs, "query_id", dims)
      .select(col("id").as("query_id"), col("pool").as("q_pool"),
        array_max(transform(col("pool"), x => abs(x))).as("_q_amax")))
    val pc = pooledDocs.select(col("id").as("doc_id"),
      col("pool").as("c_pool"), col("n_tokens"),
      array_max(transform(col("pool"), x => abs(x))).as("_c_amax"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_mean").desc, col("doc_id"))
    // CHECKED 2^53 exactness bound (the pHash MaxPHashBytes precedent —
    // an a-priori input bound that fails LOUD instead of diverging
    // silently): the coarse key is the single division _dot/n_tokens,
    // exact only while _dot is an exact-in-double BIGINT, and the
    // integer dot itself wraps past 2^63. dims·max|q_i|·max|c_i| bounds
    // |Σ q_i·c_i| (triangle inequality), so requiring it ≤ 2^53 rules
    // out BOTH failure modes before they happen. The bound product is
    // compared in double — conservative by at most 1 ulp. Remediation
    // when it trips: chunk the doc token bags upstream (CdcChunk) or
    // pool at a smaller quantization scale.
    val exactBound = lit((1L << 53).toDouble)
    val boundOk = col("_q_amax").cast("double") *
      col("_c_amax").cast("double") * lit(dims.toDouble) <= exactBound
    val cand = pc.crossJoin(pq)
      .withColumn("_dot",
        graft.functions.DotCodes.dot_codes(col("q_pool"), col("c_pool")))
      .withColumn("_mean",
        when(boundOk,
          col("_dot").cast("double") / col("n_tokens").cast("double"))
          .otherwise(raise_error(concat(
            lit("maxSimFunnel: dims*max|q_pool|*max|c_pool| for (query "),
            col("query_id"), lit(", doc "), col("doc_id"),
            lit(") exceeds 2^53 — the pooled coarse key is no longer an "
              + "exact double (and the integer dot may wrap); chunk the "
              + "token bags or lower the poolSum quantization scale")))
            .cast("double")))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= shortlist)
      .select(col("query_id"), col("doc_id"))
    maxSimRerank(cand, queryVecs, docVecs, k)
  }

  /** MEAN-pooled FLOAT vectors from a [[poolSum]] output —
    * `(vec_id, embedding ARRAY<FLOAT>)`, the repo-wide single-vector
    * contract, so the ENTIRE IVF serving stack (assign, persisted
    * index, probe, two-level, rebalance, forget) applies to a pooled
    * token corpus unchanged. Each component is
    * `(pool_i / 1e6 / n_tokens).toFloat` — one f64 divide chain then
    * one rounding, deterministic everywhere; cosine is scale-invariant
    * so the mean-vs-sum choice never changes a ranking, and the
    * quantized pool keeps the artifact exact while this view is the
    * lossy (float) serving key. */
  def meanVectors(pooled: DataFrame): DataFrame =
    pooled.select(col("id").as("vec_id"),
      transform(col("pool"), p =>
        (p.cast("double") / lit(1000000.0) /
          col("n_tokens").cast("double")).cast("float")).as("embedding"))

  /** The ANN-coarse late-interaction funnel — the shape that survives
    * 100 TB: [[maxSimFunnelWith]]'s coarse stage scores EVERY pooled
    * doc per query (exact, but O(pooled corpus) per batch — the
    * documented brute-coarse trade), while here the shortlist comes
    * from a PROBED persisted IVF index over the [[meanVectors]] view
    * (cell-pruned scan, bounded candidates — cost ∝ probed cells, not
    * the corpus) and only the shortlisted docs' token bags are MaxSim
    * re-scored through the id-pruned [[maxSimRerank]] fetch. Recall
    * semantics are IVF (a doc whose mean vector lives in an unprobed
    * cell is missed — the standard ColBERT-serving trade); at
    * saturating nprobe ≥ C and shortlist ≥ |docs| the candidate set is
    * every doc and the final ranking equals [[maxSimTopK]] exactly
    * (spec-pinned — MaxSim rescoring makes the coarse ORDER
    * irrelevant once membership saturates).
    *
    * CONTRACT: query ids must not collide with doc ids — the IVF
    * probe excludes self-matches by id equality, so a query sharing an
    * indexed doc's id would silently drop that doc from its shortlist.
    * Offset the query-id space (the gate queries use +1000). */
  def maxSimFunnelAnn(queryVecs: DataFrame, docVecs: DataFrame,
                      ivfIndex: DataFrame, centroidsDf: DataFrame,
                      k: Int, dims: Int, shortlist: Int,
                      nprobe: Int): DataFrame = {
    require(shortlist >= k,
      s"maxSimFunnelAnn: shortlist=$shortlist must be >= k=$k")
    val qMeans = meanVectors(poolSum(queryVecs, "query_id", dims))
    val cand = Similarity.ivfTopKFromIndex(qMeans, ivfIndex,
        k = shortlist, centroidsDf, nprobe)
      .select(col("query_id"), col("neighbor_id").as("doc_id"))
    maxSimRerank(cand, queryVecs, docVecs, k)
  }

  /** Score EVERY document against every query — the exact form (and the
    * oracle's). `queryVecs`: (query_id, token_idx, embedding) — a bounded
    * batch; `docVecs`: (doc_id, token_idx, embedding) — the corpus. */
  def maxSimTopK(queryVecs: DataFrame, docVecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"maxSimTopK: k=$k must be >= 1")
    val q = broadcast(queryVecs.select(col("query_id"),
      col("token_idx").as("q_tok"), col("embedding").as("q_emb")))
    val scored = docVecs.select(col("doc_id"), col("embedding").as("d_emb"))
      .crossJoin(q)
      .withColumn("_cos", Similarity.cosineGuarded(col("q_emb"), col("d_emb")))
    scoreAndRank(scored, k)
  }

  /** Rerank a candidate shortlist `(query_id, doc_id)` (e.g. from
    * [[Similarity.ivfTopK]] over pooled vectors): only shortlisted
    * documents' tokens are scored, so work is candidates × tokens — the
    * production funnel. Agrees with [[maxSimTopK]] whenever the
    * candidate set contains the true top-k (all-pairs candidates ⇒
    * exact, spec-pinned).
    *
    * CONTRACT: every candidate `doc_id` must have token rows in
    * `docVecs` — a candidate with none joins away SILENTLY (it is
    * absent from the ranked output, not scored-and-lost), so a pooled
    * index that drifts from the token table produces invisible recall
    * holes. Keep the two artifacts in the same snapshot; audit with
    * `candidates.join(docVecs, "doc_id", "left_anti")` when in doubt.
    *
    * Fetch shape: the candidate list LOCALIZES (≤ |queries|·shortlist
    * (query, doc) pairs by contract) and its distinct doc ids push into
    * the token-table scan as an `isin` literal — against a doc_id-sorted
    * persisted token table that is a row-group-pruned read of just the
    * shortlisted docs' tokens. The previous
    * `broadcast(candidates).join(docVecs)` shape never shuffled the
    * token table but READ ALL of it per batch — the identical
    * O(corpus)-scan-per-trigger term [[Similarity.shortlistEmbeddings]]
    * removed from the seven single-vector rerank tails (SCALE.md r15
    * measured it at 7× on the IVF-PQ serve; the token table is
    * |tokens|× bigger than a float corpus, so this tail pays it
    * worse). Localizing also runs the coarse funnel stage exactly once
    * per batch. Past the cap the broadcast-join shape returns. */
  def maxSimRerank(candidates: DataFrame, queryVecs: DataFrame,
                   docVecs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"maxSimRerank: k=$k must be >= 1")
    val spark = candidates.sparkSession
    val distinctCand = candidates.select(col("query_id"), col("doc_id"))
      .distinct()
    val q = broadcast(queryVecs.select(col("query_id"),
      col("token_idx").as("q_tok"), col("embedding").as("q_emb")))
    val docSide = docVecs.select(col("doc_id"), col("embedding").as("d_emb"))
    val rows = distinctCand
      .limit(Similarity.MaxLocalShortlistRows + 1).collect()
    val fetched =
      if (rows.length > Similarity.MaxLocalShortlistRows)
        docSide.join(broadcast(distinctCand), Seq("doc_id"))
      else {
        import scala.jdk.CollectionConverters._
        val local = spark.createDataFrame(rows.toSeq.asJava,
          distinctCand.schema)
        val dIdx = distinctCand.schema.fieldIndex("doc_id")
        val ids = rows.map(_.getLong(dIdx)).distinct.toIndexedSeq
        if (ids.isEmpty) docSide.join(broadcast(local), Seq("doc_id"))
        else docSide.filter(col("doc_id").isin(ids: _*))
          .join(broadcast(local), Seq("doc_id"))
      }
    val scored = fetched
      .join(q, Seq("query_id"))
      .withColumn("_cos", Similarity.cosineGuarded(col("q_emb"), col("d_emb")))
    scoreAndRank(scored, k)
  }
}
