package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, ValueState}

import graft.similarity.Similarity
import graft.text.TextOps

/** Incremental near-duplicate detection over a DOCUMENT STREAM: each
  * arriving doc is checked against everything already ingested, without
  * ever re-scanning the corpus — the streaming twin of
  * [[Similarity.minhashPairs]].
  *
  * Shape: the map-only signature stage (native NgramHash → MinHashSig
  * kernels, bit-identical to the batch path) fans each doc out to its
  * (band, bucket) LSH cells; `transformWithState` keyed on the cell holds
  * the docs previously seen in that cell (RocksDB state — off-heap,
  * disk-bounded) and emits a candidate pair for every new-vs-seen
  * collision. A pair colliding in several bands emits once per band
  * (at-least-once per band — `dropDuplicatesWithinWatermark` or a
  * downstream exact verify collapses them; the batch operator's
  * `dropDuplicates` plays that role there).
  *
  * `exact_sig` is true when the FULL signatures match (xxhash64 of all k
  * slots) — at MinHash resolution an exact duplicate; near-dups below
  * that collide in some bands with `exact_sig=false` and need a
  * downstream Jaccard verify against stored text (state deliberately
  * holds only (doc_id, sig_hash) — 16 bytes/doc/band — never text).
  *
  * At scale: state per cell is capped (`maxBucketSize` — identical-
  * signature pileups are real duplicates; the cap bounds the quadratic
  * emission an adversarial cell could produce, same guard as the batch
  * path) and idle cells are TTL-evicted, so state tracks the ACTIVE
  * near-dup surface, not corpus history.
  */
object StreamingDedup {

  case class StreamDoc(doc_id: Long, text: String)
  case class BandHit(band: Int, bucket: Long, doc_id: Long, sig_hash: Long)
  case class StreamDup(doc_id: Long, dup_of: Long, band: Int,
                       exact_sig: Boolean)

  /** Seen-doc record per LSH cell: 16 bytes, never the document. */
  case class SeenDoc(doc_id: Long, sig_hash: Long)

  /** The shared cell loop: probe BEFORE append (a doc never pairs with
    * itself; two same-batch duplicates pair once, (later, earlier), not
    * twice), rows processed in doc_id order (deterministic emission
    * direction — cells whose shuffle iterators order a same-batch pair
    * differently would otherwise emit it both ways), membership-guarded
    * append (an at-least-once source re-delivering a doc must not store
    * it twice: duplicate SeenDoc records would multiply every later
    * emission and squat the bounded cell slots).
    *
    * Cap semantics — deliberately DIFFERENT from the batch operator's:
    * `maxBucketSize` here is an arrival-order STATE guard (the first cap
    * docs are stored; later arrivals still probe the stored ones but are
    * not stored themselves), while batch `minhashPairs` drops an overfull
    * cell ENTIRELY — a rule that needs the final bucket size, which an
    * incremental operator cannot know. Outputs therefore agree with batch
    * exactly when no cell exceeds the cap (the batch default is uncapped);
    * on a hot cell the streaming form degrades to bounded emission instead
    * of batch's all-or-nothing drop. */
  private def probeCell[H, O](seen: ListState[SeenDoc], maxBucketSize: Int,
      rows: Iterator[H], docId: H => Long, sigHash: H => Long,
      emit: (SeenDoc, H) => O): Iterator[O] = {
    // cell population is bounded by maxBucketSize — safe to materialize
    val existing = scala.collection.mutable.ArrayBuffer
      .empty[SeenDoc] ++= seen.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[O]
    rows.toVector.sortBy(docId).foreach { h =>
      existing.foreach { s =>
        if (s.doc_id != docId(h)) out += emit(s, h)
      }
      if (existing.length < maxBucketSize &&
          !existing.exists(_.doc_id == docId(h))) {
        val rec = SeenDoc(docId(h), sigHash(h))
        existing += rec
        seen.appendValue(rec)
      }
    }
    out.iterator
  }

  class BucketDedupProcessor(maxBucketSize: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, BandHit, StreamDup] {
    @transient private var seen: ListState[SeenDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SeenDoc]("seen",
        Encoders.product[SeenDoc], ttl)

    override def handleInputRows(key: String, rows: Iterator[BandHit],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[StreamDup] =
      probeCell[BandHit, StreamDup](seen, maxBucketSize, rows,
        _.doc_id, _.sig_hash,
        (s, h) => StreamDup(h.doc_id, s.doc_id, h.band,
          s.sig_hash == h.sig_hash))
  }

  /** @param docs streaming DataFrame with (`idCol`: long, `textCol`: string)
    * @param maxBucketSize per-cell state cap (skew/adversary guard)
    * @param ttl idle-cell eviction (requires ProcessingTime time mode)
    */
  def nearDupCandidates(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", shingleN: Int = 3,
                        numHashes: Int = 32, numBands: Int = 8,
                        maxBucketSize: Int = 64,
                        ttl: TTLConfig = TTLConfig.NONE): Dataset[StreamDup] = {
    require(numBands > 0 && numHashes % numBands == 0,
      s"numBands ($numBands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / numBands
    val spark = docs.sparkSession
    import spark.implicits._

    // signature stage — the same kernels as the batch operator. The
    // repartition is the STREAMING staging barrier (localCheckpoint is
    // batch-only): it materializes (id, sig) below the exchange so the
    // banding projection above reads sig as a shuffled attribute instead
    // of inlining k copies of the signature computation (the HOF
    // re-evaluation trap, third sighting — see NOTES).
    val sigs = docs.select(
        col(idCol).cast("long").as("doc_id"),
        array_distinct(TextOps.ngramHashes(TextOps.tokens(col(textCol)),
          shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Similarity.minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"), col("sig"))
      .repartition(col("doc_id"))

    val banded = sigs
      .select(col("doc_id"), xxhash64(col("sig")).as("sig_hash"),
        explode(Similarity.bands(col("sig"), numBands, rowsPerBand)).as("b"))
      .select(col("b.band").as("band"), col("b.bucket").as("bucket"),
        col("doc_id"), col("sig_hash"))
      .as[BandHit]

    banded
      .groupByKey(h => s"${h.band}:${h.bucket}")
      .transformWithState(new BucketDedupProcessor(maxBucketSize, ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append(), Encoders.product[StreamDup])
  }

  // ------------------------------------------------------- verified pairs

  /** Band hit carrying the arriving doc's shingle ids as a RIDER — the
    * same payload the batch operator ships through its band shuffle. Cell
    * STATE still stores only 16-byte [[SeenDoc]] records. */
  case class BandHitV(band: Int, bucket: Long, doc_id: Long, sig_hash: Long,
                      sh: Array[Long])

  /** Verify-stage input, keyed by `key`: a doc ARRIVAL (key = its own id,
    * `sh` = its shingles, stored once per doc) or a CANDIDATE (key = the
    * seen doc's id, `sh` = the NEW doc's shingles riding along). */
  case class VerifyIn(key: Long, doc_id: Long, sh: Array[Long],
                      isArrival: Boolean)

  /** Same contract as [[Similarity.minhashPairs]]' output rows:
    * id_a < id_b, exact shingle-set Jaccard, ≥ minJaccard. */
  case class VerifiedDup(id_a: Long, id_b: Long, jaccard: Double)

  // public: a private case class makes the state encoder's generated code
  // fall back to the interpreted path (Janino cannot touch private members)
  case class ShRec(sh: Array[Long])

  /** Cell stage of the VERIFIED path: the same [[probeCell]] loop as
    * [[BucketDedupProcessor]] (16-byte state records, cap, redelivery
    * guard), but emits candidates keyed for the verify stage with the new
    * doc's shingles riding along. The deterministic doc_id processing
    * order matters doubly here: an order-dependent emission direction
    * would route one pair to two different verify keys (see probeCell). */
  class BucketCandidateProcessor(maxBucketSize: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, BandHitV, VerifyIn] {
    @transient private var seen: ListState[SeenDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SeenDoc]("seen",
        Encoders.product[SeenDoc], ttl)

    override def handleInputRows(key: String, rows: Iterator[BandHitV],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[VerifyIn] =
      probeCell[BandHitV, VerifyIn](seen, maxBucketSize, rows,
        _.doc_id, _.sig_hash,
        (s, h) => VerifyIn(s.doc_id, h.doc_id, h.sh, isArrival = false))
  }

  /** Exact-Jaccard verify, keyed by the SEEN doc's id: a per-doc
    * ValueState holds that doc's shingle ids (stored once per doc — the
    * price of exact verification; TTL-bound it to the dedup horizon, the
    * same horizon the cell TTL uses). Arrivals in a batch apply before
    * candidates, so same-batch pairs verify against same-batch state;
    * cross-band duplicates of one pair land in one call (single arrival
    * batch) and dedupe in-memory, so each pair emits ONCE — matching the
    * batch operator's dropDuplicates. A candidate whose seen-doc state was
    * TTL-evicted is beyond the retention horizon and drops silently. */
  class ShingleVerifyProcessor(minJaccard: Double, ttl: TTLConfig)
      extends StatefulProcessor[Long, VerifyIn, VerifiedDup] {
    @transient private var sh: ValueState[ShRec] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sh = getHandle.getValueState[ShRec]("sh", Encoders.product[ShRec], ttl)

    override def handleInputRows(key: Long, rows: Iterator[VerifyIn],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[VerifiedDup] = {
      val buf = rows.toArray
      buf.find(_.isArrival).foreach(a => sh.update(ShRec(a.sh)))
      val cur = Option(sh.get()).map(_.sh).orNull
      if (cur == null) Iterator.empty
      else {
        val curSet = cur.toSet
        buf.iterator.filterNot(_.isArrival)
          .map(c => c.doc_id -> c).toMap.valuesIterator // per-pair dedup
          .flatMap { c =>
            val other = c.sh.toSet
            val inter = curSet.count(other)
            val uni = curSet.size + other.size - inter
            val j = if (uni > 0) inter.toDouble / uni else 0.0
            if (j >= minJaccard)
              Some(VerifiedDup(math.min(key, c.doc_id),
                math.max(key, c.doc_id), j))
            else None
          }
      }
    }
  }

  /** VERIFIED streaming near-dup pairs — the batch contract of
    * [[Similarity.minhashPairs]] ((id_a, id_b, jaccard), id_a < id_b,
    * exact shingle Jaccard ≥ `minJaccard`, one row per pair), computed
    * incrementally: LSH cells generate candidates (16-byte state records,
    * capped), then a per-doc shingle store verifies them with exact set
    * Jaccard. Two chained `transformWithState` stages in one query.
    *
    * Contract caveats vs batch: (a) under an at-least-once source a
    * REDELIVERED doc can re-verify its pairs (at-least-once output — same
    * caveat as the candidates API); (b) `maxBucketSize` is an
    * arrival-order state guard, NOT batch's whole-cell drop — outputs
    * match `minhashPairs` exactly when no cell exceeds the cap (see
    * [[probeCell]] for why the batch rule cannot exist incrementally). */
  def nearDupVerified(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", shingleN: Int = 3,
                      numHashes: Int = 32, numBands: Int = 8,
                      minJaccard: Double = 0.5, maxBucketSize: Int = 64,
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[VerifiedDup] = {
    require(numBands > 0 && numHashes % numBands == 0,
      s"numBands ($numBands) must divide numHashes ($numHashes)")
    verifiedFromSigs(sigsOf(docs, idCol, textCol, shingleN, numHashes),
      numHashes / numBands, numBands, minJaccard, maxBucketSize, ttl)
  }

  /** The map-only signature stage shared by the verified paths. */
  private def sigsOf(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int, numHashes: Int): DataFrame =
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        array_distinct(TextOps.ngramHashes(TextOps.tokens(col(textCol)),
          shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Similarity.minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"), col("sh"), col("sig"))
      .repartition(col("doc_id")) // staging barrier — see nearDupCandidates

  private def verifiedFromSigs(sigs: DataFrame, rowsPerBand: Int,
                               numBands: Int, minJaccard: Double,
                               maxBucketSize: Int, ttl: TTLConfig)
      : Dataset[VerifiedDup] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()

    val banded = sigs
      .select(col("doc_id"), col("sh"), xxhash64(col("sig")).as("sig_hash"),
        explode(Similarity.bands(col("sig"), numBands, rowsPerBand)).as("b"))
      .select(col("b.band").as("band"), col("b.bucket").as("bucket"),
        col("doc_id"), col("sig_hash"), col("sh"))
      .as[BandHitV]

    val candidates = banded
      .groupByKey(h => s"${h.band}:${h.bucket}")
      .transformWithState(new BucketCandidateProcessor(maxBucketSize, ttl),
        timeMode, OutputMode.Append(), Encoders.product[VerifyIn])

    val arrivals = sigs
      .select(col("doc_id").as("key"), col("doc_id"), col("sh"),
        lit(true).as("isArrival"))
      .as[VerifyIn]

    candidates.unionByName(arrivals)
      .groupByKey(_.key)
      .transformWithState(new ShingleVerifyProcessor(minJaccard, ttl),
        timeMode, OutputMode.Append(), Encoders.product[VerifiedDup])
  }

  /** Exactly-once gate per pair: a (id_a, id_b)-keyed ValueState marks
    * pairs already emitted; re-sightings (an at-least-once source
    * redelivering a doc re-runs its verifications) drop. One boolean per
    * emitted pair within the TTL horizon — the pair-key state cost NOTES
    * flagged, now opt-in. */
  class PairOnceProcessor(ttl: TTLConfig)
      extends StatefulProcessor[(Long, Long), VerifiedDup, VerifiedDup] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, ttl)

    override def handleInputRows(key: (Long, Long),
        rows: Iterator[VerifiedDup],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[VerifiedDup] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        rows.take(1) // re-sightings within the batch are the same pair
      }
  }

  /** [[nearDupVerified]] with EXACTLY-ONCE output under source redelivery:
    * a third stage drops pairs already emitted (TTL-bound the memory to
    * the same dedup horizon as the cell/shingle state). Without a TTL the
    * pair set grows with the emitted-pair count — near-dup output is
    * normally a tiny fraction of the corpus, but bound it in production. */
  def nearDupVerifiedOnce(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", shingleN: Int = 3,
                          numHashes: Int = 32, numBands: Int = 8,
                          minJaccard: Double = 0.5, maxBucketSize: Int = 64,
                          ttl: TTLConfig = TTLConfig.NONE)
      : Dataset[VerifiedDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    nearDupVerified(docs, idCol, textCol, shingleN, numHashes, numBands,
        minJaccard, maxBucketSize, ttl)
      .groupByKey(d => (d.id_a, d.id_b))
      .transformWithState(new PairOnceProcessor(ttl),
        timeMode, OutputMode.Append(), Encoders.product[VerifiedDup])
  }

  /** Streaming dedup against BOTH a persisted corpus index and the stream
    * itself — the full production composition: arrivals are checked
    * against everything ever admitted
    * ([[graft.similarity.IncrementalDedup]]'s index, via a stream-static
    * band join verified map-side — no state) AND against earlier stream
    * docs (the stateful cell path), with one pair-once gate over the
    * union, so the output is EXACTLY-ONCE per pair even under source
    * redelivery.
    *
    * Contract: over any prefix of the stream, the emitted pair set equals
    * `IncrementalDedup.pairsAgainstIndex(prefixDocs, index)` at the same
    * parameters (parity-spec'd) WHEN NO BUCKET CAP BINDS. When one does,
    * the two sides bound work differently — that call counts the
    * index∪batch union per bucket, while here the stream path caps its
    * LSH cells ([[probeCell]]) and the static join drops index buckets
    * whose INDEX-side population exceeds `maxBucketSize` (an arrival
    * cannot know prefix-wide union counts without keeping them as
    * state). Both are hard bounds on per-arrival work; a hot boilerplate
    * cell in a billion-doc index can no longer fan one arrival out into
    * thousands of verify rows per band per micro-batch.
    *
    * `index` must be built with the SAME shingleN/numHashes family.
    * At scale: `persist()` the index (or pre-band and bucket it by
    * (band, bucket)) — a stream-static join re-executes the static side
    * every micro-batch, including the bucket-size census; the index scan
    * reads (id, sh, sig) only, never corpus text. */
  def nearDupVerifiedWithIndex(docs: DataFrame, index: DataFrame,
                               idCol: String = "doc_id",
                               textCol: String = "text", shingleN: Int = 3,
                               numHashes: Int = 32, numBands: Int = 8,
                               minJaccard: Double = 0.5,
                               maxBucketSize: Int = 64,
                               ttl: TTLConfig = TTLConfig.NONE)
      : Dataset[VerifiedDup] = {
    require(numBands > 0 && numHashes % numBands == 0,
      s"numBands ($numBands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / numBands
    val spark = docs.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()

    val sigs = sigsOf(docs, idCol, textCol, shingleN, numHashes)
    val streamPairs = verifiedFromSigs(sigs, rowsPerBand, numBands,
      minJaccard, maxBucketSize, ttl)

    def bandedOf(df: DataFrame, id: String, sh: String): DataFrame =
      df.select(col("id").as(id), col("sh").as(sh),
          explode(Similarity.bands(col("sig"), numBands, rowsPerBand)).as("b"))
        .select(col(id), col(sh), col("b.band").as("band"),
          col("b.bucket").as("bucket"))
    val bandedIdxAll = bandedOf(index, "idx_id", "idx_sh")
    // cap hot index cells: same pileup guard as the stream path's
    // probeCell, counted on the index side (see the scaladoc caveat)
    val bandedIdx =
      if (maxBucketSize <= 0) bandedIdxAll
      else bandedIdxAll.join(
        bandedIdxAll.groupBy("band", "bucket")
          .agg(count(lit(1)).as("_bn"))
          .filter(col("_bn") <= maxBucketSize)
          .select("band", "bucket"),
        Seq("band", "bucket"), "left_semi")
    val bandedStream = bandedOf(
      sigs.select(col("doc_id").as("id"), col("sh"), col("sig")),
      "doc_id", "doc_sh")
    // stream-vs-index: both shingle sets are in hand, so verification is
    // map-side — no state; per-band duplicate collisions of one pair
    // collapse in the pair-once gate below (all of them land in the batch
    // the doc arrives in, since the index side is static)
    val idxPairs = bandedStream
      .join(bandedIdx, Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("idx_id"))
      .select(
        least(col("doc_id"), col("idx_id")).as("id_a"),
        greatest(col("doc_id"), col("idx_id")).as("id_b"),
        Similarity.jaccard(col("doc_sh"), col("idx_sh")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .as[VerifiedDup]

    streamPairs.unionByName(idxPairs)
      .groupByKey(d => (d.id_a, d.id_b))
      .transformWithState(new PairOnceProcessor(ttl),
        timeMode, OutputMode.Append(), Encoders.product[VerifiedDup])
  }
}
