package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003 — the MOSS algorithm): hash every character k-gram of the
  * normalized text, slide a window of `w` consecutive gram hashes, and
  * select each window's minimum (rightmost position on hash ties). The
  * selected `(position, hash)` set is a ~2/(w+1)-density fingerprint
  * with the winnowing guarantee: any match of length ≥ k + w − 1
  * between two documents shares at least one selected fingerprint —
  * local similarity detection with a coverage proof, vs MinHash's
  * whole-document probabilistic estimate.
  *
  * Exactness contract (the reason this oracles bit-for-bit): the gram
  * hash is the first 10 hex digits of md5 (40 bits — both engines
  * agree on md5), and the rightmost-min tie-break is encoded
  * arithmetically by packing `hash * 2^20 + (2^20 − 1 − pos)` into one
  * BIGINT: minimizing the packed key minimizes the hash and, among
  * equal hashes, MAXIMIZES the position. 40 + 20 = 60 bits — no
  * overflow, no float surface anywhere.
  *
  * The 2^20 position field caps supported documents at ~1M normalized
  * characters. That is deliberate: web/training documents beyond 1 MB
  * are chunked upstream anyway ([[CdcChunk]]), and keeping the pack in
  * one BIGINT keeps the whole operator inside whole-stage codegen.
  *
  * Scale: gram explosion is map-only (per-doc explode, no shuffle);
  * the window min is ONE shuffle on the doc id; the overlap join
  * shuffles the (doc, hash) fingerprint set — 2/(w+1) of the gram
  * count, i.e. the winnowing density IS the shuffle discount. Bucket
  * skew (a boilerplate gram selected by thousands of docs) is capped
  * by `maxBucket`, same contract as MinHash LSH's `maxBucketSize`.
  */
object Fingerprint {

  private val PosBits = 20
  private val PosField = 1L << PosBits // 2^20

  /** Winnowed fingerprints: one row per selected `(fp_pos, fp_hash)`
    * per document (deduped — adjacent windows usually select the same
    * gram; that collapse is the density guarantee).
    *
    * MAP-ONLY: winnowing is per-document-local, so the whole selection
    * runs as array higher-order expressions on each doc row — gram
    * hashes via `transform`, window minima via `array_min(slice(…))`,
    * dedup via `array_distinct` — and only the ~2/(w+1)-density
    * SELECTION explodes to rows. The naive shape (explode every gram,
    * window-min over a doc-id partition) shuffles and sorts the full
    * gram stream — measured 72s vs 3s on a 50× corpus; this one
    * shuffles nothing at all.
    *
    * @param k gram length in normalized characters
    * @param w window length in grams; guarantee threshold = k + w − 1
    * @param spreadInput repartition the docs before hashing (default
    *   true — the [[SubstringDedup.spans]] knob, same rationale): the
    *   selection does O(n·w) hash work per input byte, so a coarse
    *   scan partitioning (single-row-group parquet = ONE task)
    *   serializes the whole pass; the 1× text shuffle amortizes
    *   against it. Pass false when the input is already cluster-wide
    *   (thousands of splits) — then the operator is genuinely
    *   shuffle-free.
    */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int, w: Int, spreadInput: Boolean = true): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive (got k=$k w=$w)")
    val spread = if (spreadInput) {
      val targetPar = math.max(
        docs.sparkSession.sparkContext.defaultParallelism,
        docs.sparkSession.conf
          .get("spark.sql.shuffle.partitions", "200").toInt)
      docs.repartition(targetPar, col(idCol))
    } else docs
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9]", "")
    // the selection runs in the native WinnowKeys kernel (one tight
    // loop, O(1)-amortized deque window-min, codegen'd) — Spark's
    // array HOFs never enter whole-stage codegen, so the equivalent
    // transform/array_min/array_distinct form paid boxed-closure
    // dispatch per gram×w. The kernel throws LOUD on docs beyond the
    // 2^20 packed-position cap (silent hash-bit borrowing is the
    // alternative); docs that long chunk upstream (CdcChunk).
    spread
      .select(col(idCol), norm.as("_s"))
      // need at least one full window of w grams (k + w - 1 chars)
      .filter(length(col("_s")) >= k + w - 1)
      .select(col(idCol), explode(
        graft.functions.WinnowKeys.winnowKeys(col("_s"), k, w)).as("_sel"))
      .select(col(idCol),
        (lit(PosField - 1) - (col("_sel") % PosField)).as("fp_pos"),
        // keys are positive 60-bit, so a logical shift IS the integer
        // divide (Column./ would be double division — a float surface)
        shiftright(col("_sel"), PosBits).as("fp_hash"))
  }

  /** MOSS-style overlap detection over [[winnow]] output: document
    * pairs sharing ≥ `minShared` distinct fingerprint HASHES, with the
    * shared count. Position-blind (a moved block still matches — the
    * point of fingerprinting over substring-dedup).
    *
    * `maxBucket` drops hashes selected by more than that many
    * documents before pairing — boilerplate grams pair quadratically
    * and signal nothing (the same skew cap as LSH banding). `0`
    * disables the cap (the oracled query runs uncapped so the SQL twin
    * states the full semantics).
    */
  def overlapPairs(fps: DataFrame, idCol: String,
                   minShared: Int, maxBucket: Int = 0): DataFrame = {
    // stage the deduped fingerprint set: it feeds BOTH sides of the
    // pair self-join (and the bucket filter) — without the stage every
    // consumer re-runs the full winnow hash pass (observed 4 scans in
    // the containment plan). The set is the ~2/(w+1)-density artifact;
    // the 100 TB analog is a staging write of the fingerprint table.
    val dfp = fps.select(col(idCol).as("_id"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    val bucketed =
      if (maxBucket <= 0) dfp
      else {
        val cnt = Window.partitionBy(col("fp_hash"))
        dfp.withColumn("_n", count(lit(1)).over(cnt))
          .filter(col("_n") <= maxBucket).drop("_n")
      }
    val a = bucketed.select(col("_id").as("id_a"), col("fp_hash"))
    val b = bucketed.select(col("_id").as("id_b"), col("fp_hash"))
    a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Asymmetric near-containment over [[winnow]] output: pairs where
    * the SMALLER fingerprint set is mostly inside the other —
    * `contain_ppm = shared · 10⁶ div min(|A|, |B|)`. Catches what the
    * symmetric overlap count can't rank: a short doc quoted wholesale
    * inside a long one shares few fingerprints in absolute terms but
    * ~all of its own. Same join shape as [[overlapPairs]] plus two
    * doc-sized count joins; position-blind.
    */
  def containmentPairs(fps: DataFrame, idCol: String,
                       minContainPpm: Long,
                       maxBucket: Int = 0): DataFrame = {
    // staged for the same reason as in [[overlapPairs]] — four
    // consumers here (two join sides + two count joins)
    val dfp = fps.select(col(idCol).as("_id"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    val bucketed =
      if (maxBucket <= 0) dfp
      else {
        val cnt = Window.partitionBy(col("fp_hash"))
        dfp.withColumn("_bn", count(lit(1)).over(cnt))
          .filter(col("_bn") <= maxBucket).drop("_bn")
      }
    // denominators come from the SAME (possibly capped) universe as the
    // shared counts — counting |A| uncapped while n_shared is capped
    // would deflate contain_ppm and drop genuinely-contained pairs
    // whose fingerprints are mostly popular hashes
    val counts = bucketed.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val a = bucketed.select(col("_id").as("id_a"), col("fp_hash"))
    val b = bucketed.select(col("_id").as("id_b"), col("fp_hash"))
    a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(counts.select(col("_id").as("id_a"), col("_n").as("n_a")),
        Seq("id_a"))
      .join(counts.select(col("_id").as("id_b"), col("_n").as("n_b")),
        Seq("id_b"))
      .withColumn("contain_ppm",
        expr("(n_shared * 1000000) div least(n_a, n_b)"))
      .filter(col("contain_ppm") >= minContainPpm)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("contain_ppm"))
  }

  /** Match LOCATION for qualifying pairs — the MOSS report view: for
    * every pair sharing ≥ `minShared` fingerprint hashes, one row per
    * shared hash with BOTH documents' positions `(id_a, id_b, pos_a,
    * pos_b, fp_hash)`. Positions are where the winnowing guarantee
    * anchors the match (any shared run of ≥ k+w−1 chars surfaces
    * here) — the reason to fingerprint positionally instead of
    * MinHashing whole docs. A hash selected at multiple positions in
    * one doc emits the position cross product for that pair (all
    * anchor candidates).
    */
  def matchSpans(fps: DataFrame, idCol: String, minShared: Int,
                 maxBucket: Int = 0): DataFrame = {
    val dfp = fps.select(col(idCol).as("_id"), col("fp_pos"),
        col("fp_hash"))
      .localCheckpoint(true) // feeds the pair gate AND both span sides
    val qualifying = overlapPairs(dfp, "_id", minShared, maxBucket)
      .select(col("id_a"), col("id_b"))
    val a = dfp.select(col("_id").as("id_a"), col("fp_pos").as("pos_a"),
      col("fp_hash"))
    val b = dfp.select(col("_id").as("id_b"), col("fp_pos").as("pos_b"),
      col("fp_hash"))
    a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .join(qualifying, Seq("id_a", "id_b"), "left_semi")
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        col("fp_hash"))
  }

  // ---- index lifecycle (build → persist → probe → fold-in) -----------
  // The IncrementalDedup contract for the winnowing family: a new crawl
  // batch probes a persisted fingerprint index — corpus TEXT is never
  // re-read or re-hashed (fingerprints are ~2/(w+1) of the gram count,
  // a few hundred bytes per doc) — then the admitted docs' fingerprints
  // fold in for the next batch.

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val indexSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("fp_pos", LongType, nullable = true),
    StructField("fp_hash", LongType, nullable = true)))

  /** Persist a fingerprint index ([[winnow]] rows with the id column
    * named `id`) — distributed layout, no single-file coalesce (the
    * index is O(corpus·density); at scale writers bucket by fp_hash so
    * probe joins co-locate). `k`/`w` persist alongside
    * (`<path>.params`) so a probe with mismatched build parameters —
    * which would silently find near-zero overlaps and admit every
    * duplicate — fails fast at the driver instead
    * ([[loadIndexParams]] / [[pairsAgainstSavedIndex]]). */
  def saveIndex(index: DataFrame, path: String, k: Int, w: Int): Unit = {
    val cols = indexSchema.fields
      .map(f => col(f.name).cast(f.dataType).as(f.name))
    index.select(cols.toIndexedSeq: _*).write.mode("overwrite").parquet(path)
    val spark = index.sparkSession
    import spark.implicits._
    Seq((k, w)).toDF("k", "w").coalesce(1)
      .write.mode("overwrite").parquet(path + ".params")
  }

  /** The (k, w) an index at `path` was built with. */
  def loadIndexParams(spark: SparkSession, path: String): (Int, Int) = {
    val r = spark.read.parquet(path + ".params")
      .select(col("k").cast("int"), col("w").cast("int")).head()
    (r.getInt(0), r.getInt(1))
  }

  /** Probe a SAVED index with its own recorded parameters — the
    * misuse-proof entry point: the caller cannot supply a k/w that
    * disagrees with what built the index. */
  def pairsAgainstSavedIndex(spark: SparkSession, path: String,
                             newDocs: DataFrame, idCol: String,
                             textCol: String, minShared: Int,
                             maxBucket: Int = 0): DataFrame = {
    val (k, w) = loadIndexParams(spark, path)
    pairsAgainstIndex(newDocs, loadIndex(spark, path), idCol, textCol,
      k, w, minShared, maxBucket)
  }

  /** Load a fingerprint index, failing fast at the driver on schema
    * drift (the [[graft.similarity.IncrementalDedup]] convention). */
  def loadIndex(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    indexSchema.fields.foreach { f =>
      require(got.get(f.name).contains(f.dataType),
        s"fingerprint-index schema mismatch at $path: expected " +
          s"${f.name}: ${f.dataType.sql}, found " +
          got.get(f.name).map(_.sql).getOrElse("<missing>"))
    }
    df.select(indexSchema.fields.map(f => col(f.name)).toIndexedSeq: _*)
  }

  /** Overlap pairs between a new batch and the indexed corpus — exactly
    * `overlapPairs(winnow(corpus ∪ batch))` restricted to pairs with at
    * least one batch side (index-vs-index pairs were previous batches'
    * job and are never re-derived; a redelivered unchanged doc pairs
    * with its indexed self only as id_a = id_b, which the orientation
    * filter drops). Batch fingerprints are computed fresh (map-only);
    * the index contributes stored rows only. `maxBucket` counts the
    * UNION's buckets — bucket-for-bucket the full-recompute semantics.
    * k and w must match the index's build parameters (use
    * [[pairsAgainstSavedIndex]] for the checked path).
    *
    * Repeated probing (streaming triggers): pass `indexDeduped = true`
    * with an index already staged by [[stageIndexForProbe]] — then the
    * per-trigger work dedups only the BATCH side; the default path
    * dedups the whole union per call, an O(index) shuffle each time.
    */
  def pairsAgainstIndex(newDocs: DataFrame, index: DataFrame,
                        idCol: String, textCol: String, k: Int, w: Int,
                        minShared: Int, maxBucket: Int = 0,
                        indexDeduped: Boolean = false): DataFrame = {
    // per-side dedup ≡ dedup of the union here: the is_new flag differs
    // across sides, so no cross-side (id, hash, is_new) row can repeat
    val batch = winnow(newDocs, idCol, textCol, k, w)
      .select(col(idCol).cast(LongType).as("id"), col("fp_hash"))
      .distinct()
      .withColumn("is_new", lit(true))
      // staged: the self-join and the bucket filter consume it, and the
      // batch is the small side by nature
      .localCheckpoint(true)
    val idxSide = {
      val base = index.select(col("id"), col("fp_hash"))
      (if (indexDeduped) base else base.distinct())
        .withColumn("is_new", lit(false))
    }
    // one-shot path: stage the union (self-join + bucket filter would
    // otherwise re-run the index distinct per consumer). Pre-staged
    // path: the index is already a checkpoint scan — re-reading it per
    // consumer is the cheap steady state, a second checkpoint per
    // trigger would just accumulate cached copies.
    val all0 = batch.unionByName(idxSide)
    val all = if (indexDeduped) all0 else all0.localCheckpoint(true)
    val bucketed =
      if (maxBucket <= 0) all
      else {
        val cnt = Window.partitionBy(col("fp_hash"))
        all.withColumn("_n",
            size(collect_set(col("id")).over(cnt)))
          .filter(col("_n") <= maxBucket).drop("_n")
      }
    val a = bucketed.select(col("id").as("id_a"), col("fp_hash"),
      col("is_new").as("new_a"))
    val b = bucketed.select(col("id").as("id_b"), col("fp_hash"),
      col("is_new").as("new_b"))
    a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("new_a") || col("new_b"))
      // a doc present in BOTH batch and index (redelivery) pairs a
      // shared hash through up to 4 (new_a × new_b) row combinations —
      // collapse to one per (pair, hash) so counts match full recompute
      .dropDuplicates("id_a", "id_b", "fp_hash")
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** FORGET documents from a fingerprint index — the deletion half of
    * the winnow lifecycle (build → persist → probe → fold-in →
    * FORGET), [[graft.similarity.Similarity.ivfForget]]'s convention
    * for the MOSS family: remove every fingerprint row of the listed
    * ids and emit a receipt per REQUESTED id, `(id, n_fp_removed,
    * was_indexed)` — compliance wants confirmation for ids that were
    * NOT present too (0, false), not just the touched ones (the
    * [[graft.operators.Forget]] manifest discipline; an id can be
    * absent because it was never ingested OR because its text was too
    * short to fingerprint — both mean "nothing retained").
    *
    * The deletion list broadcasts (deletions are small by nature); the
    * cleaned index is ONE anti join, and with an fp_hash-bucketed
    * persisted layout only buckets holding deleted rows rewrite.
    * Forgetting is exact by construction — fingerprints are
    * per-document rows, so forget(index, ids) ==
    * rebuild-without-those-docs bit-for-bit (spec-pinned), unlike
    * sketch-family state where deletion needs receipts of
    * approximation.
    *
    * @param index [[winnow]] rows with the id column named `id`
    *   ([[loadIndex]] output / [[foldIntoIndex]] result)
    * @return (cleaned index, receipt — one row per requested id)
    */
  def forgetFromIndex(index: DataFrame, deleteIds: DataFrame)
      : (DataFrame, DataFrame) = {
    val dels = broadcast(deleteIds
      .select(col(deleteIds.columns.head).cast(LongType).as("id"))
      .distinct())
    val removed = index.join(dels, Seq("id"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("_n"))
    val receipt = dels.join(removed, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_fp_removed"),
        col("_n").isNotNull.as("was_indexed"))
    (index.join(dels, Seq("id"), "left_anti"), receipt)
  }

  /** Dedupe + stage an index projection for REPEATED probing (the
    * streaming steady state): pass the result to [[pairsAgainstIndex]]
    * with `indexDeduped = true` so each trigger dedups only its batch
    * side instead of re-shuffling the whole index. */
  def stageIndexForProbe(index: DataFrame): DataFrame =
    index.select(col("id"), col("fp_hash")).distinct()
      .localCheckpoint(true)

  /** Admit a batch: index ∪ the batch's fingerprints, minus ids the
    * caller rejected as duplicates — a SET union: a redelivered doc
    * already in the index keeps its indexed rows and contributes
    * nothing (a bag union would double its fingerprints on every
    * fold-in and grow the index without bound). The membership probe
    * is one index scan against the broadcast batch-id set; the index
    * itself never shuffles. Write with [[saveIndex]] to a NEW path and
    * swap — never overwrite a path a prober is reading. */
  def foldIntoIndex(index: DataFrame, newDocs: DataFrame,
                    idCol: String, textCol: String, k: Int, w: Int,
                    rejectIds: DataFrame = null): DataFrame = {
    var batch = winnow(newDocs, idCol, textCol, k, w)
      .select(col(idCol).cast(LongType).as("id"),
        col("fp_pos"), col("fp_hash"))
    if (rejectIds != null) {
      val rj = rejectIds.select(
        col(rejectIds.columns.head).cast(LongType).as("id"))
      batch = batch.join(rj, Seq("id"), "left_anti")
    }
    val batchIds = batch.select(col("id")).distinct()
    val alreadyIndexed = index.select(col("id"))
      .join(broadcast(batchIds), Seq("id"), "left_semi").distinct()
    index.unionByName(
      batch.join(broadcast(alreadyIndexed), Seq("id"), "left_anti"))
  }
}
