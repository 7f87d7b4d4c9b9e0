package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HNSW — the multi-layer hierarchy over [[GraphAnn]]'s navigable-graph
  * base layer (Malkov & Yashunin, "Efficient and robust approximate
  * nearest neighbor search using Hierarchical Navigable Small World
  * graphs", TPAMI 2018). The base layer alone searches flat per hop but
  * from a SINGLE shared entry node, so hop count grows with graph
  * diameter ~ log-ish in luck, linear in the worst case; the hierarchy
  * restores log(n): geometrically sparser upper layers let a query
  * greedily descend to a near-correct layer-0 entry in O(log n) cheap
  * steps, and the expensive beam search then starts next door.
  *
  * Everything here is deterministic and SQL-replayable (the e_ann_graph
  * conventions): layer assignment is a pure hash of the node id (no
  * RNG), per-layer graphs use the caller's edge builder with the
  * (score desc, id) tie-break, the descent is the SAME hop recurrence
  * as [[GraphAnn.searchGraph]] at beam/hops budgets fixed by the
  * caller, and the layer-0 answer IS [[GraphAnn.searchGraph]] from the
  * refined entries. So the full hierarchy unrolls to per-layer CTE
  * chains in DuckDB (`e_ann_hnsw`).
  *
  * Scale design (100 TB): layer ℓ holds ~n/m^ℓ nodes, so every upper
  * layer's edge table is a vanishing fraction of layer 0's; the descent
  * reuses [[GraphAnn]]'s broadcast-frontier hop (big sides never
  * shuffle, isin row-group pruning against a persisted layered index),
  * and per-descent-step work is |queries| × degree — corpus-independent.
  * The layered index persists via [[TrainedState.saveHnswIndex]]
  * (layer-partitioned: a search reads only the layer directories it
  * descends through, and layer 0's files prune by `query_id` range
  * stats like the flat graph index).
  */
object Hnsw {

  /** Evaluate independent per-layer constructions CONCURRENTLY — the
    * lifecycle operators' layer computations (insert-by-search, repair)
    * each run a driver-eager hop loop whose cost is dominated by
    * driver-job round-trips, not data; the layers share no state, so
    * submitting their jobs from separate threads overlaps the loops and
    * the wall-clock collapses to ~the slowest layer (layer 0). Spark
    * supports concurrent job submission from one session; nothing in
    * these operators mutates session state. Results come back in layer
    * order, so output content and ordering are exactly the sequential
    * plan's. */
  private def parLayers[T](ls: Range)(f: Int => T): Seq[T] = {
    require(ls.nonEmpty, "Hnsw.parLayers: empty layer range")
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    // one job group per call: a failed layer CANCELS its siblings' Spark
    // jobs instead of letting them run to completion behind the thrown
    // exception (wasted cluster work + delayed failure surfacing)
    val gid = s"hnsw-layers-${java.util.UUID.randomUUID()}"
    // bounded pool: a pathological caller-supplied maxLevel queues
    // layers instead of minting a thread per layer (layers beyond the
    // cap wait — correctness is unaffected, only overlap narrows)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(ls.size, MaxLayerThreads))
    implicit val ec =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futs = ls.map(l => scala.concurrent.Future {
        sc.setJobGroup(gid, s"hnsw layer $l", interruptOnCancel = true)
        try f(l) finally sc.clearJobGroup()
      })
      // Future.sequence fails FAST — completes with the first layer's
      // failure without waiting for the rest; order is preserved
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
      catch {
        case t: Throwable =>
          try sc.cancelJobGroup(gid) catch { case _: Throwable => () }
          pool.shutdownNow()
          throw t
      }
    } finally pool.shutdown()
  }

  /** Concurrency cap for [[parLayers]]; real indexes have ≤ ~5 layers,
    * so the cap only binds on hostile maxLevel inputs. */
  private val MaxLayerThreads = 8

  /** Sanity ceiling for caller-supplied maxLevel on the lifecycle
    * entry points that take no `m` (so [[levels]]' m^maxLevel ≤ 2^40
    * bound cannot check it): m ≥ 2 means no real index exceeds 40
    * layers, and the per-layer loops must not spin on a typo'd bound. */
  private val MaxLevelBound = 64

  /** Fail-loud guard for the lifecycle operators that rebuild the edge
    * table as a union of layers 0..maxLevel: a maxLevel BELOW the
    * index's actual top layer would silently drop every higher layer's
    * rows from the returned index — truncation, not an error the caller
    * asked for. One bounded agg action (the lifecycle ops already run
    * many driver jobs); an empty edge table passes (top = -1). */
  private def requireCoversTop(layered: DataFrame, maxLevel: Int,
                               op: String): Unit = {
    require(maxLevel >= 0 && maxLevel <= MaxLevelBound,
      s"Hnsw.$op: maxLevel=$maxLevel out of [0, $MaxLevelBound]")
    val r = layered.agg(max(col("layer"))).collect()
    val top = if (r.isEmpty || r(0).isNullAt(0)) -1
      else r(0).get(0) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
      }
    require(maxLevel >= top,
      s"Hnsw.$op: maxLevel=$maxLevel is below the index's top layer " +
        s"$top — layers ${maxLevel + 1}..$top would be silently dropped")
  }

  /** Deterministic geometric layer assignment: node v's top layer is
    * the largest ℓ ≤ maxLevel with md5₄₈(v) ≡ 0 (mod m^ℓ) — a pure
    * function of the id with P(level ≥ ℓ) = m^-ℓ, the HNSW geometric
    * distribution without RNG state (md5 over the decimal string, the
    * [[PortableSim]] md5-slice convention, so DuckDB replays it
    * verbatim). Divisibility by m^ℓ implies divisibility by m^(ℓ-1),
    * so layer membership is NESTED by construction — every layer-ℓ
    * node lives in all layers below, the HNSW invariant.
    *
    * @return `(vec_id, level)` — level in [0, maxLevel]
    */
  def levels(corpus: DataFrame, m: Int, maxLevel: Int): DataFrame = {
    require(m >= 2, s"Hnsw.levels: m=$m must be >= 2")
    require(maxLevel >= 0 && math.pow(m, maxLevel) <= (1L << 40),
      s"Hnsw.levels: maxLevel=$maxLevel out of range for m=$m")
    val h = conv(substring(md5(col("vec_id").cast("string").cast("binary")),
      1, 12), 16, 10).cast("long")
    val lvl = (1 to maxLevel)
      .map(l => when(h % lit(math.pow(m, l).toLong) === 0, 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    corpus.select(col("vec_id"), lvl.cast("int").as("level"))
  }

  /** The LAYERED index: `(layer, query_id, rank, neighbor_id, cos_sim)`
    * for layers 0..maxLevel — layer ℓ is `edgeBuilder` run over the
    * nodes with level ≥ ℓ (so each layer is a navigable graph over its
    * own nested node set). Default builder: exact kNN
    * ([[Similarity.bruteTopK]]) at `degree` — swap in
    * [[Similarity.knnGraphAdjacent]] for corpus-scale builds; the
    * layered shape and search are builder-oblivious. */
  def buildIndex(corpus: DataFrame, degree: Int, m: Int, maxLevel: Int,
                 edgeBuilder: Option[(DataFrame, Int) => DataFrame] = None)
      : DataFrame = {
    require(degree >= 1, s"Hnsw.buildIndex: degree=$degree must be >= 1")
    val build = edgeBuilder.getOrElse(
      (nodes: DataFrame, d: Int) => Similarity.bruteTopK(nodes, nodes, d))
    val lv = levels(corpus, m, maxLevel)
    (0 to maxLevel).map { l =>
      val nodes = corpus.join(
        lv.filter(col("level") >= l).select(col("vec_id")), Seq("vec_id"))
      build(nodes, degree)
        .select(lit(l).as("layer"), col("query_id"), col("rank"),
          col("neighbor_id"), col("cos_sim"))
    }.reduce(_.unionByName(_))
  }

  /** DIVERSIFIED neighbor selection — the published HNSW
    * neighbor-selection heuristic (Malkov & Yashunin TPAMI 2018,
    * Algorithm 4) as an [[buildIndex]] `edgeBuilder`: per node, walk
    * the `degree × candFactor` nearest candidates in rank order and
    * KEEP a candidate only if it is strictly closer to the node than
    * to every already-kept neighbor (here: `cos(e, q) > cos(e, w)` for
    * all kept `w`). Plain top-`degree` kNN edges cluster: on grouped
    * data every out-edge lands inside the node's own cluster and the
    * graph fragments into islands the beam walk cannot leave — the
    * heuristic spends part of the degree budget on spread, which is
    * what keeps recall high at fixed small degree (the paper's central
    * construction result; recall-vs-plain is spec-pinned on a planted
    * clustered geometry).
    *
    * `fill` (Algorithm 4's `keepPrunedConnections`): after the greedy
    * pass, top the list back up to `degree` with the REJECTED
    * candidates in rank order, so out-degree stays exactly
    * `min(degree, candidates)`; `fill = false` returns the pure
    * diversified set (possibly shorter — the oracled form).
    *
    * Determinism & oracle: candidates rank by the standard
    * (cos desc, id) order; the greedy fold is a per-node
    * `aggregate(...)` over the rank-sorted candidate array with a
    * broadcast-free pairwise-sim map, ties rejected (strict `>`), so
    * the whole selection is pure rank/score arithmetic and replays in
    * DuckDB as a recursive CTE over rank positions (`e_ann_hnsw_diverse`).
    *
    * Scale: pairwise candidate sims are |nodes| × C² rows for C =
    * degree × candFactor — bounded per node, never all-pairs; the
    * fold runs inside one hash aggregation per node. The candidate
    * generator is [[Similarity.bruteTopK]] here (the build-time
    * default); swap the first stage for an ANN candidate source at
    * corpus scale exactly like [[buildIndex]]'s builder swap.
    *
    * @return `(query_id, rank, neighbor_id, cos_sim)` — rank 1.. by
    *         (cos_sim desc, neighbor_id) over the selected set
    */
  /** @param candidateSource candidate generator `(nodes, C) =>
    *   (query_id, rank, neighbor_id, cos_sim)` with rank 1..C per
    *   query by (cos desc, id) — defaults to [[autoCandidateSource]]
    *   (exact [[Similarity.bruteTopK]] below
    *   [[MinNodesForBucketedCandidates]] nodes, the IVF-bucketed
    *   source above it, so a naive corpus-scale caller never lands on
    *   the n² build); pass an explicit source to override the
    *   dispatch — the selection then runs over ITS candidate set,
    *   with the pairwise diversity sims still computed exactly from
    *   the embeddings
    * @param minNodesForBucketed the auto-dispatch threshold (spec
    *   hook; callers keep the default) */
  def diversifiedEdges(nodes: DataFrame, degree: Int, candFactor: Int = 3,
                       fill: Boolean = true,
                       candidateSource: Option[(DataFrame, Int) => DataFrame]
                         = None,
                       minNodesForBucketed: Long =
                         MinNodesForBucketedCandidates): DataFrame = {
    require(degree >= 1,
      s"Hnsw.diversifiedEdges: degree=$degree must be >= 1")
    require(candFactor >= 1,
      s"Hnsw.diversifiedEdges: candFactor=$candFactor must be >= 1")
    val source = candidateSource.getOrElse(
      autoCandidateSource(minNodesForBucketed))
    val cands = source(nodes, degree * candFactor)
    val embOf = nodes.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_ne"))
    val candE = cands.join(embOf, Seq("neighbor_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos_sim"), col("_ne"))
    val a = candE.select(col("query_id"), col("rank"),
      col("neighbor_id").as("cand"), col("cos_sim"), col("_ne").as("_ea"))
    val b = candE.select(col("query_id"),
      col("neighbor_id").as("other"), col("_ne").as("_eb"))
    // pairwise sims among one node's candidates (C² per node, bounded)
    val pair = a.join(b, Seq("query_id"))
      .filter(col("cand") =!= col("other"))
      .select(col("query_id"), col("cand"), col("other"),
        Similarity.cosineGuarded(col("_ea"), col("_eb")).as("sim"))
    val simAgg = pair.groupBy(col("query_id"), col("cand"))
      .agg(sort_array(collect_list(struct(col("other"), col("sim"))))
        .as("simlist"))
    val withSims = candE
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("cand"), col("cos_sim"))
      .join(simAgg, Seq("query_id", "cand"), "left")
      .withColumn("simlist", coalesce(col("simlist"),
        array().cast("array<struct<other:bigint,sim:double>>")))
    val arr = withSims.groupBy(col("query_id"))
      // struct leads with rank → sort_array walks candidates in rank
      // order, Algorithm 4's iteration order
      .agg(sort_array(collect_list(struct(col("rank"), col("cand"),
        col("cos_sim"), col("simlist")))).as("_cs"))
    val keptType = "array<struct<cand:bigint,cos:double>>"
    def keepStruct(cd: org.apache.spark.sql.Column) =
      struct(cd.getField("cand").as("cand"),
        cd.getField("cos_sim").as("cos"))
    // keep iff closer to the node than to EVERY kept neighbor: max sim
    // to the kept set via filter+max over the pairwise list — the
    // exact shape the DuckDB replay uses (list_filter + list_max)
    val kept = aggregate(col("_cs"), array().cast(keptType),
      (acc, cd) => when(size(acc) < degree &&
          cd.getField("cos_sim") > coalesce(
            array_max(transform(
              filter(cd.getField("simlist"), x => array_contains(
                transform(acc, w => w.getField("cand")),
                x.getField("other"))),
              x => x.getField("sim"))),
            lit(-2.0)),
        array_append(acc, keepStruct(cd))).otherwise(acc))
    val selected = arr.withColumn("_kept", kept)
    val chosen =
      if (!fill) selected.select(col("query_id"), col("_kept"))
      else selected.withColumn("_kept",
        aggregate(col("_cs"), col("_kept"),
          (acc, cd) => when(size(acc) < degree &&
              !array_contains(
                transform(acc, w => w.getField("cand")),
                cd.getField("cand")),
            array_append(acc, keepStruct(cd))).otherwise(acc)))
        .select(col("query_id"), col("_kept"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    chosen.select(col("query_id"), explode(col("_kept")).as("_c"))
      .select(col("query_id"), col("_c.cand").as("neighbor_id"),
        col("_c.cos").as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos_sim"))
  }

  /** [[diversifiedEdges]] curried to [[buildIndex]]'s `edgeBuilder`
    * shape — `buildIndex(corpus, degree, m, maxLevel,
    * Some(Hnsw.diversifiedBuilder()))` builds the full published HNSW
    * construction: geometric layers + per-layer diversified edges
    * (each layer dispatches its own candidate source by ITS node
    * count, so the geometrically small upper layers stay exact while
    * a corpus-sized layer 0 goes bucketed). */
  def diversifiedBuilder(candFactor: Int = 3, fill: Boolean = true,
                         candidateSource: Option[(DataFrame, Int) => DataFrame]
                           = None,
                         minNodesForBucketed: Long =
                           MinNodesForBucketedCandidates)
      : (DataFrame, Int) => DataFrame =
    (nodes, d) => diversifiedEdges(nodes, d, candFactor, fill,
      candidateSource, minNodesForBucketed)

  /** Node-count threshold above which [[diversifiedEdges]]' default
    * candidate stage switches from the exact quadratic
    * [[Similarity.bruteTopK]] to the IVF-bucketed source: below it the
    * n² scoring is cheaper than training cells (and bit-exact); above
    * it the quadratic build is the 100 TB failure mode the dispatch
    * exists to make unreachable — the [[Similarity.ivfAssignAuto]]
    * pattern applied to graph construction. 2¹⁵ nodes ≈ 10⁹ brute
    * pairs, the knee where the bucketed source's measured ~corpus
    * scaling (SCALE.md round-12: 2.13× at 10× corpus vs ~100× for
    * brute) starts winning outright. */
  val MinNodesForBucketedCandidates: Long = 1L << 15

  /** The default candidate stage of [[diversifiedEdges]]: ONE bounded
    * count of the node set, then exact [[Similarity.bruteTopK]] below
    * `minNodes` and [[bucketedCandidateSource]] above. Small inputs
    * (every gate corpus, every upper HNSW layer) keep the bit-exact
    * oracled path; corpus-sized inputs get candidates from fixed-size
    * IVF cells without the caller having to know the seam exists. */
  def autoCandidateSource(minNodes: Long = MinNodesForBucketedCandidates)
      : (DataFrame, Int) => DataFrame = (nodes, c) => {
    require(minNodes >= 1,
      s"Hnsw.autoCandidateSource: minNodes=$minNodes must be >= 1")
    if (nodes.count() < minNodes) Similarity.bruteTopK(nodes, nodes, c)
    else bucketedCandidateSource()(nodes, c)
  }

  /** The IVF-bucketed candidate generator for corpus-scale
    * [[diversifiedEdges]] builds: ~√n cells whose centroids are a
    * DETERMINISTIC hash-stride sample of the nodes themselves (the
    * [[levels]] md5 convention — no RNG state, no window over the
    * corpus), assignment via [[Similarity.ivfAssignAuto]] (which
    * two-levels itself above 4096 cells), candidates via
    * [[Similarity.knnGraphAdjacent]] at `nprobe` cells. Candidate
    * quality is approximate by design — the diversity sims downstream
    * are still exact — and total candidate work is Σ(cell²) ≈ n·√n,
    * never all-pairs. */
  def bucketedCandidateSource(nprobe: Int = 2)
      : (DataFrame, Int) => DataFrame = (nodes, c) => {
    require(nprobe >= 1,
      s"Hnsw.bucketedCandidateSource: nprobe=$nprobe must be >= 1")
    val n = nodes.count()
    val targetCells = math.max(1L, math.round(math.sqrt(n.toDouble)))
    val stride = math.max(1L, n / targetCells)
    val h = conv(substring(md5(col("vec_id").cast("string")
      .cast("binary")), 1, 12), 16, 10).cast("long")
    val cents = nodes.filter(pmod(h, lit(stride)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
      .localCheckpoint(true)
    // P(no node hashes to 0 mod stride) ≈ e^-√n — negligible, but a
    // silent empty centroid table would make every assignment (and
    // the whole edge table) silently empty, so fail loud instead
    require(!cents.isEmpty,
      "Hnsw.bucketedCandidateSource: hash-stride sampling selected no " +
        "centroids — pass an explicit candidateSource")
    Similarity.knnGraphAdjacent(
      Similarity.ivfAssignAuto(nodes, cents), cents, c, nprobe)
  }

  /** The deterministic global entry point: the LOWEST id among the
    * nodes of the highest non-empty layer (ids break every tie in this
    * codebase). Driver-side one-row action — the index build already
    * materialized the layers. Returns (entryId, entryLevel). */
  def entryOf(levelsDf: DataFrame): (Long, Int) = {
    val top = levelsDf.orderBy(col("level").desc, col("vec_id").asc)
      .select(col("vec_id"), col("level")).limit(1).collect()
    require(top.nonEmpty, "Hnsw.entryOf: empty level table")
    (top(0).getLong(0), top(0).getInt(1))
  }

  /** HNSW search: greedy-ish descent through the upper layers (each
    * layer runs the [[GraphAnn]] hop recurrence at the small
    * `beamUpper`/`hopsUpper` budget and keeps the single closest
    * visited node — self included, it exists in every lower layer — as
    * the next layer's entry), then the full [[GraphAnn.searchGraph]]
    * beam search on layer 0 from the per-query refined entries.
    *
    * With `entryLevel = 0` this IS `searchGraph` from `entryId` (the
    * hierarchy degenerates to its base layer — spec-pinned), and with
    * saturating budgets it degenerates to exact brute force over the
    * connected component, exactly like the flat search.
    *
    * @param layered    [[buildIndex]] output (or
    *                   [[TrainedState.loadHnswIndex]])
    * @param entryId    global entry node (see [[entryOf]])
    * @param entryLevel the entry's layer — descent starts here
    * @param beamUpper  beam width per upper layer (HNSW uses 1; >1
    *                   trades descent cost for entry quality)
    * @param hopsUpper  hop budget per upper layer (fixpoint early-exit
    *                   applies, so a generous budget only costs real
    *                   improvement rounds)
    */
  def search(queries: DataFrame, layered: DataFrame, corpus: DataFrame,
             entryId: Long, entryLevel: Int, beamUpper: Int, hopsUpper: Int,
             beam: Int, hops: Int, k: Int): DataFrame =
    searchImpl(queries, layered, corpus, entryId, entryLevel, beamUpper,
      hopsUpper, beam, hops, k, allowed = None)

  /** METADATA-FILTERED hierarchical search — the
    * [[GraphAnn.searchGraphFiltered]] design lifted to the hierarchy:
    * the DESCENT and the layer-0 WALK are both unfiltered (a filtered
    * descent could strand a query in a region with no matching nodes
    * at all — the disconnection hazard, one layer up), and the
    * predicate binds at the FINAL rank, so the answer is exactly the
    * top-k of (layer-0 visited ∩ matching). Recall under selective
    * predicates is the same beam/hops budget dial as the flat filtered
    * search; `filtered == post-filter + re-rank of the unfiltered
    * hierarchy at ANY budget` is spec-pinned.
    *
    * @param pred row predicate over the corpus columns */
  def searchFiltered(queries: DataFrame, layered: DataFrame,
                     corpus: DataFrame, entryId: Long, entryLevel: Int,
                     beamUpper: Int, hopsUpper: Int, beam: Int, hops: Int,
                     k: Int, pred: org.apache.spark.sql.Column): DataFrame =
    searchImpl(queries, layered, corpus, entryId, entryLevel, beamUpper,
      hopsUpper, beam, hops, k,
      allowed = Some(corpus.filter(pred)
        .select(col("vec_id").as("node"))))

  /** DiskANN-LAYERED serving: the hierarchy searched entirely over PQ
    * CODES — descent AND layer-0 walk both run [[GraphAnn.walkPq]]'s
    * ADC-scored hop recurrence (the [[GraphAnn.searchGraphPq]] scoring
    * context, built ONCE and shared across layers), and the float
    * corpus is touched exactly once, by the final exact re-rank of the
    * `k·rerank` ADC survivors. This is the serving shape for
    * billion-vector layered indexes from media where floats don't fit:
    * layered adjacency + codes stay hot, full vectors stay cold — and
    * the upper layers are geometrically small, so the descent adds a
    * corpus-independent constant exactly like the float hierarchy.
    *
    * The index (graphs per layer) is built OFFLINE at full precision —
    * only SERVING reads codes, the e_ann_graph_pq_full convention.
    * With `entryLevel = 0` this IS [[GraphAnn.searchGraphPq]]
    * (spec-pinned), and at saturating beam + full rerank on a connected
    * layer-0 graph the ADC approximation cancels out entirely and the
    * answer equals exact brute force, exactly like the flat form.
    *
    * Each descent step keeps the single ADC-CLOSEST visited node (self
    * included — it exists in every lower layer) as the next layer's
    * entry; ADC ties break on node id, so the whole trajectory is
    * deterministic and unrolls to per-layer CTE chains over the
    * e_ann_pq_full ADC fold (`e_ann_hnsw_pq`). */
  def searchPq(queries: DataFrame, layered: DataFrame, codes: DataFrame,
               books: DataFrame, dim: Int, numSub: Int, corpus: DataFrame,
               entryId: Long, entryLevel: Int, beamUpper: Int,
               hopsUpper: Int, beam: Int, hops: Int, k: Int,
               rerank: Int = 4): DataFrame = {
    require(entryLevel >= 0, s"Hnsw.searchPq: entryLevel=$entryLevel < 0")
    require(beamUpper >= 1 && hopsUpper >= 0,
      s"Hnsw.searchPq: beamUpper=$beamUpper (>=1), hopsUpper=$hopsUpper " +
        "(>=0)")
    require(beam >= 1 && hops >= 0 && k >= 1 && rerank >= 1,
      s"Hnsw.searchPq: beam=$beam hops=$hops k=$k rerank=$rerank must " +
        "all be >= 1 (hops >= 0)")
    val ctx = GraphAnn.pqSearcher(queries, codes, books, dim, numSub)
    def layerEdges(l: Int) = layered.filter(col("layer") === l)
      .select(col("query_id"), col("neighbor_id"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("node"))
    var entries = ctx.qLocal.select(col("vec_id").as("query_id"))
      .withColumn("node", lit(entryId))
    var entryIds: Seq[Long] = Seq(entryId)
    var l = entryLevel
    while (l >= 1) {
      // one descent step: ADC-closest visited node at layer l (incl.
      // self — the float descent's rule with the ADC score in place of
      // cosine); refined entries collected to a local relation (one
      // bounded row per query — the float descent's convention)
      val visited = GraphAnn.walkPq(ctx, layerEdges(l), entries, entryIds,
        beamUpper, hopsUpper)
      val rows = visited.withColumn("_r", row_number().over(wTop))
        .filter(col("_r") === 1)
        .select(col("query_id"), col("node"))
        .collect()
      entries = GraphAnn.localPairs(queries.sparkSession, rows)
      val ids = rows.map(_.getLong(1)).distinct.sorted
      entryIds =
        if (ids.length <= GraphAnn.MaxInlineFrontier) ids.toIndexedSeq
        else Nil
      l -= 1
    }
    val visited0 = GraphAnn.walkPq(ctx, layerEdges(0), entries, entryIds,
      beam, hops)
    GraphAnn.rerankPqTail(ctx, corpus, visited0, k, rerank)
  }

  private def searchImpl(queries: DataFrame, layered: DataFrame,
                         corpus: DataFrame, entryId: Long, entryLevel: Int,
                         beamUpper: Int, hopsUpper: Int, beam: Int,
                         hops: Int, k: Int,
                         allowed: Option[DataFrame]): DataFrame = {
    require(entryLevel >= 0, s"Hnsw.search: entryLevel=$entryLevel < 0")
    require(beamUpper >= 1 && hopsUpper >= 0,
      s"Hnsw.search: beamUpper=$beamUpper (>=1), hopsUpper=$hopsUpper (>=0)")
    def layerEdges(l: Int) = layered.filter(col("layer") === l)
      .select(col("query_id"), col("neighbor_id"))
    // ONE bounded count of the probe batch, shared by every layer:
    // each step's seed is one row per query, so this bounds every
    // walk's seed and no step pays its own guard count
    var seedBound = queries.count()
    var entries = queries.select(col("vec_id").as("query_id"))
      .withColumn("node", lit(entryId))
    var entryIds: Seq[Long] = Seq(entryId)
    var l = entryLevel
    while (l >= 1) {
      // one descent step: closest visited node at layer l (incl. self)
      val found = GraphAnn.searchFrom(queries, layerEdges(l), corpus,
        entries, entryIds, beamUpper, hopsUpper, k = 1, allowed = None,
        includeSelf = true, seedBound = seedBound)
      // bounded: ONE row per query — collect the refined entries to a
      // local relation (one job; the old checkpoint + distinct-limit
      // pair cost ~5) and derive the isin-pruning id list driver-side
      // (the GraphAnn.MaxInlineFrontier contract)
      val rows = found.filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("node"))
        .collect()
      entries = GraphAnn.localPairs(queries.sparkSession, rows)
      seedBound = rows.length.toLong
      val ids = rows.map(_.getLong(1)).distinct.sorted
      entryIds =
        if (ids.length <= GraphAnn.MaxInlineFrontier) ids.toIndexedSeq
        else Nil
      l -= 1
    }
    GraphAnn.searchFrom(queries, layerEdges(0), corpus, entries, entryIds,
      beam, hops, k, allowed, includeSelf = false, seedBound = seedBound)
  }

  /** INCREMENTAL INSERT into a layered index — the HNSW growth path,
    * completing the hierarchy's lifecycle parity with the flat graph
    * ([[GraphAnn.insertBySearch]]), IVF ([[Similarity.ivfFoldIn]]) and
    * PQ ([[IvfPq.foldIn]]) families: each new vector draws its top
    * layer from the SAME deterministic hash as [[levels]] (so an
    * incrementally-grown index and a rebuilt one agree on every node's
    * layer membership — no RNG state to persist), and then runs the
    * flat insert-by-search INDEPENDENTLY at every layer it joins:
    * forward edges = its `degree` nearest search results over that
    * layer's pre-batch graph, reverse edges re-prune only the touched
    * sources' out-lists. Nested membership is preserved by
    * construction (level ≥ ℓ inserts into every layer ≤ ℓ).
    *
    * Batch semantics are [[GraphAnn.insertBySearch]]'s bulk-parallel
    * approximation per layer (batch-mates don't link within one call —
    * single-vector sequential insertion equals a rebuild under
    * saturating budgets, spec-pinned). The ENTRY is elected PER LAYER
    * from the pre-batch corpus's own deterministic level assignment —
    * the lowest id with level ≥ ℓ — so every layer's search seeds at a
    * MEMBER of that layer. (Seeding every layer at one global entry
    * would create edges to — and re-prune out-lists of — a node at
    * layers its hash does not assign it to, breaking the nested-
    * membership invariant and skewing the [[indexStats]] geometric
    * audit.) A layer with no pre-batch member passes through untouched:
    * there is nothing to link to, exactly like a rebuild's singleton
    * layer, and later batches link against the node once it is corpus;
    * [[searchAuto]] keeps re-deriving the serving entry from the edge
    * table, so no state hands off.
    *
    * Scale: per layer, cost is one bounded-batch search plus the
    * touched-slice re-prune; upper layers see geometrically fewer batch
    * members (P(level ≥ ℓ) = m^-ℓ), so the whole insert costs ~the
    * layer-0 insert — and the corpus-sized edge remainder passes
    * through unshuffled at every layer. Entry election is ONE bounded
    * agg job (per-level minima), shared by all layers.
    *
    * @param corpus the PRE-BATCH indexed corpus (embeddings the graph's
    *               node ids resolve against — the searchGraph contract);
    *               must be non-empty (build a seed index instead)
    * @return the updated layered edge table, [[buildIndex]] schema
    */
  def insert(layered: DataFrame, batch: DataFrame, corpus: DataFrame,
             m: Int, maxLevel: Int, beam: Int, hops: Int,
             degree: Int): DataFrame =
    insertWithDelta(layered, batch, corpus, m, maxLevel, beam, hops,
      degree)._1

  /** [[insert]] returning BOTH the full updated edge table and the
    * CHANGED slice (touched sources' re-pruned out-lists + the new
    * nodes' forward edges, layer-tagged) — the rows a production
    * fold-in persists via [[TrainedState.appendHnswDelta]] while the
    * untouched corpus-sized remainder's files stay in place. Write
    * cost then scales with the BATCH, not the index: the r11 scale
    * run attributed the insert leg's growth entirely to materializing
    * the full copy-on-write edge table, which the delta path never
    * does. `full == unchanged-base ∪ delta` by construction
    * (spec-pinned: loading a delta-appended index equals loading a
    * full rewrite, bit for bit). */
  def insertWithDelta(layered: DataFrame, batch: DataFrame,
                      corpus: DataFrame, m: Int, maxLevel: Int,
                      beam: Int, hops: Int, degree: Int)
      : (DataFrame, DataFrame) = {
    require(degree >= 1, s"Hnsw.insert: degree=$degree must be >= 1")
    requireCoversTop(layered, maxLevel, "insert")
    // ONE bounded count of the batch, shared by every layer: it bounds
    // each per-layer walk's seed (the layer slice ⊆ batch), so no
    // layer's walk pays its own guard count
    val batchBound = batch.count()
    val lv = levels(batch, m, maxLevel)
    // per-level minima of the pre-batch corpus, one job; the layer-ℓ
    // entry is the min over levels ≥ ℓ (a member of layer ℓ by the
    // nested-membership construction)
    val minByLevel = levels(corpus, m, maxLevel)
      .groupBy(col("level")).agg(min(col("vec_id")).as("mn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def entryAt(l: Int): Option[Long] = {
      val c = (l to maxLevel).flatMap(minByLevel.get)
      if (c.isEmpty) None else Some(c.min)
    }
    require(entryAt(0).isDefined,
      "Hnsw.insert: empty pre-batch corpus — build a seed index instead")
    val outCols = (d: DataFrame, l: Int) =>
      d.select(lit(l).as("layer"), col("query_id"), col("rank"),
        col("neighbor_id"), col("cos_sim"))
    val perLayer = parLayers(0 to maxLevel) { l =>
      val layerEdges = layered.filter(col("layer") === l)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos_sim"))
      entryAt(l) match {
        case Some(e) =>
          val sub = batch.join(
            lv.filter(col("level") >= l).select(col("vec_id")),
            Seq("vec_id"))
          val (untouched, changed) = GraphAnn.insertBySearchParts(
            layerEdges, corpus, sub, e, beam, hops, degree,
            batchBound = batchBound)
          (outCols(untouched, l), outCols(changed, l))
        case None => // no pre-batch member at this layer: passthrough
          (outCols(layerEdges, l), outCols(layerEdges.limit(0), l))
      }
    }
    val delta = perLayer.map(_._2).reduce(_.unionByName(_))
    val full = perLayer.map(_._1).reduce(_.unionByName(_))
      .unionByName(delta)
    (full, delta)
  }

  /** FORGET a set of node ids from every layer — [[GraphAnn.graphForget]]
    * applied per layer (a node's edges vanish from each layer it
    * inhabits; nested membership means a deleted upper-layer node also
    * leaves every layer below), with the per-layer receipts MERGED into
    * one row per requested id (totals across layers; the negative
    * confirmation for never-indexed ids survives the merge). Degree
    * holes are left by design, exactly like the flat forget —
    * [[GraphAnn.graphRepair]] heals any single layer's holes if needed.
    * Deleting the current entry is SAFE at the index level:
    * [[searchAuto]] re-elects the entry from the surviving edge table
    * (lowest id at the highest remaining layer) on the next serve.
    *
    * @return (updated layered edges, receipts `(vec_id, n_out_removed,
    *         n_in_removed, was_indexed)` — totals across layers)
    */
  def forget(layered: DataFrame, deleteIds: DataFrame, maxLevel: Int)
      : (DataFrame, DataFrame) = {
    requireCoversTop(layered, maxLevel, "forget")
    // bounded deletion batch → local relation once: every layer's
    // anti-join broadcasts are job-free (the lifecycle ops are already
    // construction-eager via the coverage guard above)
    val ids = broadcast(GraphAnn.localIds(deleteIds))
    val perLayer = (0 to maxLevel).map { l =>
      val (e, r) = GraphAnn.graphForgetWith(
        layered.filter(col("layer") === l)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("cos_sim")),
        ids)
      (e.select(lit(l).as("layer"), col("query_id"), col("rank"),
        col("neighbor_id"), col("cos_sim")), r)
    }
    val edges = perLayer.map(_._1).reduce(_.unionByName(_))
    val receipts = perLayer.map(_._2).reduce(_.unionByName(_))
      .groupBy(col("vec_id"))
      .agg(sum(col("n_out_removed")).as("n_out_removed"),
        sum(col("n_in_removed")).as("n_in_removed"),
        max(col("was_indexed")).as("was_indexed"))
    (edges, receipts)
  }

  /** [[forget]] + per-layer [[GraphAnn.graphRepair]] in one lifecycle
    * step — the layered analog of [[GraphAnn.graphForgetRepaired]]:
    * each layer drops the deleted ids' rows, then the layer's AFFECTED
    * surviving sources (those that pointed at a deleted id AT THAT
    * layer) re-derive their out-lists by a saturating-enough search
    * over the layer's post-forget graph. With saturating budgets the
    * result equals [[buildIndex]] over the live corpus, layer tags and
    * all (spec-pinned): untouched sources keep their build out-lists
    * verbatim (none of their top-`degree` targets were deleted, so the
    * rebuild agrees), and repaired sources get their true live
    * top-`degree`, reachability permitting.
    *
    * The repair entry is elected PER LAYER — the lowest surviving
    * source of that layer's edge table (the [[searchAuto]] convention
    * applied within a layer) — because the global entry may itself be
    * among the deleted, and a repair routed through a dead entry heals
    * nothing (the flat form's loud-failure contract; here the layer
    * just elects a live entry instead). A layer whose affected set is
    * empty skips election and repair entirely, so deleting an ENTIRE
    * upper layer degrades the index to fewer layers instead of
    * failing.
    *
    * Scale: per layer, the untouched edge remainder passes through
    * without a shuffle (broadcast anti-join on the bounded affected
    * set) and repair cost is one bounded search over |affected| ≤
    * |deleteIds| × max-in-degree sources; upper layers hold
    * geometrically fewer nodes, so the whole composition costs ~the
    * layer-0 repair.
    *
    * @return (repaired layered edges, receipts `(vec_id,
    *         n_out_removed, n_in_removed, was_indexed, n_repaired)` —
    *         totals across layers; a source affected at two layers
    *         counts twice in `n_repaired`, one re-derivation per
    *         layer)
    */
  def forgetRepaired(layered: DataFrame, corpus: DataFrame,
                     deleteIds: DataFrame, maxLevel: Int, beam: Int,
                     hops: Int, degree: Int): (DataFrame, DataFrame) = {
    require(degree >= 1, s"Hnsw.forgetRepaired: degree=$degree must be >= 1")
    requireCoversTop(layered, maxLevel, "forgetRepaired")
    // bounded deletion batch → local relation once, shared by every
    // layer: the per-layer forget/receipts/affected anti-joins (and
    // the walks' edge fetches over the kept slices) broadcast job-free
    val ids = broadcast(GraphAnn.localIds(deleteIds))
    val live = corpus.join(ids, Seq("vec_id"), "left_anti")
    val perLayer = parLayers(0 to maxLevel) { l =>
      val layerEdges = layered.filter(col("layer") === l)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("cos_sim"))
      val (kept, _) = GraphAnn.graphForgetWith(layerEdges, ids)
      // the affected set is bounded (|deleteIds| × max in-degree) —
      // localize it here so the emptiness check is free and graphRepair
      // doesn't re-derive it per downstream action
      val affected = GraphAnn.localIds(
        GraphAnn.affectedSources(layerEdges, ids))
      val receipts = GraphAnn.forgetRepairReceiptsWith(layerEdges, ids)
      // the repair search loop is driver-eager at construction, so the
      // empty-affected check costs one bounded action, not a wasted walk
      val repaired =
        if (affected.isEmpty) kept
        else {
          val surv = layerEdges
            .join(ids.withColumnRenamed("vec_id", "query_id"),
              Seq("query_id"), "left_anti")
            .agg(min(col("query_id"))).collect()
          require(surv.nonEmpty && !surv(0).isNullAt(0),
            s"Hnsw.forgetRepaired: layer $l has affected sources but no " +
              "surviving node to elect a repair entry from")
          GraphAnn.graphRepair(kept, live, affected, surv(0).getLong(0),
            beam, hops, degree)
        }
      (repaired.select(lit(l).as("layer"), col("query_id"), col("rank"),
        col("neighbor_id"), col("cos_sim")), receipts)
    }
    val edges = perLayer.map(_._1).reduce(_.unionByName(_))
    (edges, mergeRepairReceipts(perLayer.map(_._2)))
  }

  /** The [[forgetRepaired]] receipts WITHOUT running the repair
    * searches — the flat [[GraphAnn.forgetRepairReceipts]] convention
    * lifted to the hierarchy: per-layer edge arithmetic merged to one
    * row per requested id. The repair's per-layer hop loops are
    * driver-eager at construction, so an audit-first consumer must not
    * pay for them (measured: the full lifecycle costs ~3× the flat
    * repair on a 3-layer index; the arithmetic costs ~the flat
    * receipts). */
  def forgetRepairReceipts(layered: DataFrame, deleteIds: DataFrame,
                           maxLevel: Int): DataFrame = {
    requireCoversTop(layered, maxLevel, "forgetRepairReceipts")
    val ids = broadcast(GraphAnn.localIds(deleteIds))
    mergeRepairReceipts((0 to maxLevel).map { l =>
      GraphAnn.forgetRepairReceiptsWith(
        layered.filter(col("layer") === l)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("cos_sim")),
        ids)
    })
  }

  private def mergeRepairReceipts(perLayer: Seq[DataFrame]): DataFrame =
    perLayer.reduce(_.unionByName(_))
      .groupBy(col("vec_id"))
      .agg(sum(col("n_out_removed")).as("n_out_removed"),
        sum(col("n_in_removed")).as("n_in_removed"),
        max(col("was_indexed")).as("was_indexed"),
        sum(col("n_repaired")).as("n_repaired"))

  /** Per-layer index AUDIT: node/edge counts and the degree extent of
    * a layered index — the operational health check a serving fleet
    * runs before trusting an artifact (a layer whose node count is far
    * off the m^-ℓ geometric expectation means the id hash is being fed
    * non-uniform ids; max_degree > the build degree means a buggy
    * writer; layer 0 node count != corpus size means a partial write).
    * Pure counting over the edge table — no embeddings touched, safe
    * to run against a cold persisted index at any scale. */
  def indexStats(layered: DataFrame): DataFrame =
    layered.groupBy(col("layer"))
      .agg(
        countDistinct(col("query_id")).as("n_nodes"),
        count(lit(1)).as("n_edges"),
        max(col("rank")).cast("long").as("max_degree"))
      .orderBy(col("layer"))

  /** [[search]] with the entry derived from the index itself — the
    * serving-time convenience (build → save → load → search without
    * re-deriving levels): entry = lowest id at the highest layer
    * PRESENT in the edge table. */
  def searchAuto(queries: DataFrame, layered: DataFrame, corpus: DataFrame,
                 beamUpper: Int, hopsUpper: Int, beam: Int, hops: Int,
                 k: Int): DataFrame = {
    val top = layered.orderBy(col("layer").desc, col("query_id").asc)
      .select(col("query_id"), col("layer")).limit(1).collect()
    require(top.nonEmpty, "Hnsw.searchAuto: empty layered index")
    search(queries, layered, corpus, top(0).getLong(0), top(0).getInt(1),
      beamUpper, hopsUpper, beam, hops, k)
  }
}
